package graft.tools

import graft.kernels.MaxClique
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure the MCF global-bound pruning (the set-at-a-time form
  * of the reference's cross-task running max, `apps/maxclique.cpp:358`) —
  * runs MaxClique.run with and without the bound on the sf co-occurrence
  * graph and asserts identical answers.
  *
  * Usage: runMain graft.tools.McfProbe [sfDir] [cores] [rounds]
  */
object McfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cores = args.lift(1).getOrElse("32")
    val rounds = args.lift(2).getOrElse("3").toInt
    val localDir = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
      "/dev/shm/graft-spark-local")
    new java.io.File(localDir).mkdirs()
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the q31 input: thresholded co-occurrence graph (weight >= 2)
    val edges = graft.graph.Edges.coOccurrence(
        spark.read.parquet(s"$sfDir/lineitem.parquet"),
        "l_orderkey", "l_partkey")
      .filter(col("weight") >= 2)
      .select(col("src"), col("dst")).persist()
    edges.count()
    for (r <- 1 to rounds; bounded <- Seq(true, false)) {
      val t0 = System.nanoTime()
      val row = MaxClique.run(spark, edges, globalBound = bounded).head()
      val sec = (System.nanoTime - t0) / 1e9
      println(f"MCFPROBE round=$r bounded=$bounded max=${row.getInt(0)} " +
        f"n=${row.getLong(1)} sec=$sec%.2f")
    }
    spark.stop()
  }
}
