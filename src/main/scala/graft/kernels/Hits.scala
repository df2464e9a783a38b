package graft.kernels

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HITS (hubs and authorities, Kleinberg) on the engine's gather-scatter
  * substrate — the directed complement to [[EigenCentrality]]: each half
  * iteration is one join+aggregate over the DIRECTED edge table, pulling
  * the opposite score across the edge.
  *
  *   a_i(v) = Σ_{u→v} h_{i-1}(u)      (authority ← in-neighbors' hub)
  *   h_i(u) = Σ_{u→v} a_i(v)          (hub ← out-neighbors' authority)
  *
  * Normalization is deferred to the very end (one scalar per score),
  * exactly as in [[EigenCentrality]]: with h_0 ≡ 1 every unnormalized
  * score is an integer-valued path count, so fixed-iteration runs are
  * bit-replayable in plain SQL (a recursive CTE over half-steps) and
  * double stays exact far past any practical iteration count.
  *
  * Support semantics: a vertex with no in-edges carries no authority row
  * and a vertex with no out-edges into the surviving authority support
  * carries no hub row — the final full outer join coalesces both to 0,
  * so every vertex that still holds either score appears exactly once.
  *
  * Scale shape: the edge table is persisted src-partitioned once and
  * reused by all 2·iters half-steps; state joins build on the (small)
  * score side via SHUFFLE_HASH; lineage is truncated per half-step.
  */
object Hits {

  final case class Result(scores: DataFrame, iterations: Int)

  /** @param edges directed edge table (src, dst)
    * @param iters full HITS iterations (authority then hub) */
  def run(spark: SparkSession, edges: DataFrame, iters: Int): Result = {
    val e = edges.select(col("src"), col("dst")).persist()
    val verts = e.select(col("src").as("vid"))
      .union(e.select(col("dst").as("vid"))).distinct()

    var h = verts.select(col("vid"), lit(1.0).as("x")).localCheckpoint()
    // iters >= 1 so `a` is always assigned; empty-graph runs short-circuit
    // before the null-scalar aggregations below
    require(iters >= 1, "hits needs at least one iteration")
    var a: DataFrame = h.limit(0)
    for (_ <- 1 to iters) {
      val hs = h.select(col("vid").as("sv"), col("x")).hint("SHUFFLE_HASH")
      a = e.join(hs, e("src") === hs("sv"))
        .groupBy(e("dst").as("vid")).agg(sum(col("x")).as("x"))
        .localCheckpoint()
      val as = a.select(col("vid").as("sv"), col("x")).hint("SHUFFLE_HASH")
      h = e.join(as, e("dst") === as("sv"))
        .groupBy(e("src").as("vid")).agg(sum(col("x")).as("x"))
        .localCheckpoint()
    }

    def total(df: DataFrame): Double = df.agg(sum(col("x"))).first() match {
      case r if r.isNullAt(0) => 1.0 // empty side: nothing to normalize
      case r                  => r.getDouble(0)
    }
    val hTot = total(h)
    val aTot = total(a)
    val hn = h.select(col("vid"), (col("x") / hTot).as("hub"))
    val an = a.select(col("vid").as("avid"), (col("x") / aTot).as("auth"))
    val out = hn.join(an, hn("vid") === an("avid"), "full_outer")
      .select(coalesce(col("vid"), col("avid")).as("vid"),
        coalesce(col("hub"), lit(0.0)).as("hub"),
        coalesce(col("auth"), lit(0.0)).as("auth"))
    e.unpersist()
    Result(out, iters)
  }
}
