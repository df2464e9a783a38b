// scratch: sbt "runMain graft.tools.SizeProbe" — per-superstep profile
package graft.tools

import graft.corpus.{CorpusGen, EdgeDeriver}
import graft.graph.Edges
import graft.kernels.PageRank
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object SizeProbe {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_PARTITIONS", cores.toString))
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/tmp"))
      .config("spark.io.compression.codec", sys.env.getOrElse("SPARK_GRAFT_CODEC", "lz4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "800000").toLong
    val sc = CorpusGen.Scale(rows, (rows / 400).toInt, (rows / 12800).toInt, 32, 128)
    val sym = Edges.symmetrize(
      EdgeDeriver.pathEdges(CorpusGen.corpus(spark, sc), 1L, 200)
        .select(col("src"), col("dst"))).persist()
    println(s"edges=${sym.count()}")
    PageRank.run(spark, sym, fixedIter = Some(1), salts = sys.env.getOrElse("SPARK_GRAFT_SALTS", "8").toInt, symmetric = true, grid = sys.env.getOrElse("SPARK_GRAFT_GRID", "1").toInt).ranks.count()
    val t0 = System.nanoTime()
    val res = PageRank.run(spark, sym, fixedIter = Some(10),
      salts = sys.env.getOrElse("SPARK_GRAFT_SALTS", "8").toInt,
      symmetric = true,
      grid = sys.env.getOrElse("SPARK_GRAFT_GRID", "1").toInt)
    res.ranks.count()
    println(f"total=${(System.nanoTime() - t0) / 1e9}%.1f s @ local[$cores]")
    res.metrics.foreach(m => println(
      s"iter=${m.iter} wallMs=${m.wallMs} rows=${m.rows} shufR=${m.shuffleReadBytes / 1024 / 1024}MB shufW=${m.shuffleWriteBytes / 1024 / 1024}MB"))
    spark.stop()
  }
}
