package graft.tools

import graft.graph.Edges
import graft.corpus.{CorpusGen, EdgeDeriver}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: verify the PageRank superstep join reuses the cached links
  * partitioning (no per-superstep |E| Exchange). Not part of the bench. */
object PrPlanProbe {
  def main(args: Array[String]): Unit = {
    val localDir = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
      "/dev/shm/graft-spark-local")
    new java.io.File(localDir).mkdirs()
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sym = Edges.symmetrize(
      EdgeDeriver.pathEdges(CorpusGen.corpus(spark, CorpusGen.Small),
        minWeight = 1L, capPerGroup = 200)
        .select(col("src"), col("dst"))).persist()
    sym.count()
    val e = sym.select(col("src"), col("dst"), lit(1.0).as("w"))
    val outDeg = e.groupBy("src").agg(sum(col("w")).as("odeg")).persist()
    val links = e.join(outDeg.hint("SHUFFLE_HASH"), "src")
      .select(col("src"), col("dst"), (col("w") / col("odeg")).as("share"))
      .persist()
    links.count()
    val verts = outDeg.select(col("src").as("vid"))
      .repartition(col("vid")).persist()
    verts.count()
    val ranks0 = verts.select(col("vid"), lit(0.5).as("rank"))
      .localCheckpoint(eager = true)
    val state = ranks0.hint("SHUFFLE_HASH")
    val contribs = links.join(state, links("src") === state("vid"))
      .select(links("dst").as("vid"), (col("rank") * col("share")).as("c"))
    val summed = contribs.groupBy("vid").agg(sum("c").as("s"))
    val step = verts.withColumn("tele", lit(1.0 / 100))
      .join(summed.hint("SHUFFLE_HASH"), Seq("vid"), "left")
      .select(col("vid"), (lit(0.1) + coalesce(col("s"), lit(0.0))).as("rank"))
    step.write.format("noop").mode("overwrite").save()
    println("=== EXECUTED PLAN (superstep) ===")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/prplan_full.txt"), step.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
