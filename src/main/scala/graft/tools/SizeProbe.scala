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
      .config("spark.sql.join.preferSortMergeJoin", sys.env.getOrElse("SPARK_GRAFT_SMJ", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "800000").toLong
    val sc = CorpusGen.Scale(rows, (rows / 400).toInt, (rows / 12800).toInt, 32, 128)
    val sym = Edges.symmetrize(
      EdgeDeriver.pathEdges(CorpusGen.corpus(spark, sc), 1L, 200)
        .select(col("src"), col("dst"))).persist()
    println(s"edges=${sym.count()}")
    if (sys.env.get("SPARK_GRAFT_KERNEL").contains("ccloop")) {
      val t0cc = System.nanoTime()
      val cc = graft.kernels.ConnectedComponents.run(spark, sym)
      println(f"cc total=${(System.nanoTime() - t0cc) / 1e9}%.1f s iters=${cc.iterations}")
      cc.metrics.foreach(m => println(s"cc iter=${m.iter} wallMs=${m.wallMs}"))
      spark.stop(); return
    }
    if (sys.env.get("SPARK_GRAFT_KERNEL").contains("cc")) {
      // one manual CC superstep, timed in parts, plan dumped
      val edges = sym.repartition(col("src")).persist()
      edges.count()
      val labels = graft.graph.Edges.vertexIds(edges)
        .select(col("vid"), col("vid").as("component")).localCheckpoint(true)
      def t[A](tag: String)(f: => A): A = {
        val t0 = System.nanoTime(); val a = f
        println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
      }
      val msgs = edges.join(labels, edges("src") === labels("vid"))
        .select(edges("dst").as("vid"), col("component"))
      val mins = msgs.groupBy("vid").agg(min("component").as("m"))
      val next = labels.select(col("vid"), col("component"))
        .join(mins, Seq("vid"), "left")
        .select(col("vid"),
          least(col("component"), coalesce(col("m"), col("component")))
            .as("component"))
      t("mins only")(mins.localCheckpoint(true).count())
      val mat = t("full step ckpt")(next.localCheckpoint(true))
      t("count")(mat.count())
      next.count()
      println(next.queryExecution.executedPlan.toString().take(4000))
      spark.stop(); return
    }
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
