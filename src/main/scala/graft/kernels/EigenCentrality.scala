package graft.kernels

import graft.engine.{IterationMetric, Superstep}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Eigenvector centrality by power iteration on the engine's BSP substrate
  * (B1 superstep loop + B2 message passing — the same gather-scatter as
  * PageRank without teleport): x' = A·x, normalized ONCE at the end.
  *
  * Deferred normalization keeps every superstep a single join+aggregate
  * with no scalar roundtrip, and makes the fixed-iteration run exactly
  * replayable (each unnormalized x_k(v) = #walks of length k ending at v
  * when x_0 ≡ 1 — integer-valued until the final division). Magnitudes
  * grow like (avg degree)^k, so double stays exact far past any practical
  * iteration count; for tol-driven runs at scale, normalize per superstep
  * instead (one scalar agg — the PageRank dangling-mass shape).
  */
object EigenCentrality {

  final case class Result(scores: DataFrame,
                          metrics: Seq[IterationMetric],
                          iterations: Int)

  /** @param sym symmetric edge table (src, dst)
    * @param iters fixed power-iteration count */
  def run(spark: SparkSession, sym: DataFrame, iters: Int): Result = {
    val e = sym.select(col("src"), col("dst")).repartition(col("src"))
      .persist()
    val verts = e.select(col("src").as("vid")).distinct()
      .repartition(col("vid")).persist()
    verts.count()

    def init: DataFrame = verts.select(col("vid"), lit(1.0).as("x"))
    def step(x: DataFrame): DataFrame = {
      val state = x.hint("SHUFFLE_HASH")
      e.join(state, e("src") === state("vid"))
        .groupBy(e("dst").as("vid")).agg(sum(col("x")).as("x"))
    }

    val (state, metrics, it, _) = Superstep.run(
      spark, "eigencentrality", init, step,
      (_, _) => Double.MaxValue, _ => false, iters,
      ckpt = None, resume = false, countRows = false)
    val total = state.agg(sum(col("x"))).first().getDouble(0)
    val out = state.select(col("vid"), (col("x") / total).as("score"))
    e.unpersist(); verts.unpersist()
    Result(out, metrics, it)
  }
}
