package graft.tools
import graft.kernels.ConnectedComponents
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: repeated CC runs over the materialized bench-edge parquet
  * (same input as Bench's cc leg) to separate kernel cost from host
  * phases. Usage: runMain graft.tools.CcProbe <edgesParquet> [rounds] */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val localDir = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
      "/dev/shm/graft-spark-local")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (!new java.io.File(path).exists()) {
      val rows = 3200000L
      val repos = math.max(8, (rows / 400).toInt)
      val sc = graft.corpus.CorpusGen.Scale(rows, repos,
        math.max(2, repos / 32), 32, 128)
      graft.graph.Edges.symmetrize(
        graft.corpus.EdgeDeriver.pathEdges(
          graft.corpus.CorpusGen.corpus(spark, sc),
          minWeight = 1L, capPerGroup = 200)
          .select(col("src"), col("dst")))
        .write.mode("overwrite").parquet(path)
    }
    val sym = spark.read.parquet(path).persist()
    println(s"[ccprobe] edges=${sym.count()}")
    for (r <- 1 to rounds) {
      val t0 = System.nanoTime()
      val res = ConnectedComponents.run(spark, sym)
      res.components.count()
      println(f"[ccprobe] round=$r iters=${res.iterations} sec=${(System.nanoTime-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
