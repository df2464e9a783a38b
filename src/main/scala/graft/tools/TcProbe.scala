package graft.tools

import graft.kernels.TriangleCount
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: time TriangleCount.total on a pre-materialized symmetric
  * edge parquet (e.g. the bench graph on tmpfs) — the harness behind the
  * join-strategy choices in TriangleCount.
  *
  * Usage: runMain graft.tools.TcProbe <symEdgesParquet> [cores]
  */
object TcProbe {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val cores = args.lift(1).getOrElse("32")
    val localDir = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
      "/dev/shm/graft-spark-local")
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val canonical = spark.read.parquet(path)
      .filter(col("src") < col("dst")).persist()
    canonical.count()
    for (round <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = TriangleCount.total(canonical).head().getLong(0)
      println(f"TCPROBE round=$round triangles=$n sec=${(System.nanoTime - t0) / 1e9}%.1f")
    }
    spark.stop()
  }
}
