package graft.kernels

import graft.graph.Edges
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Densest-subgraph peeling (Charikar 2000, parallel 2(1+ε) variant of
  * Bahmani–Kumar–Vassilvitskii VLDB'12 at ε=0): each round removes every
  * vertex whose degree is at most the current average (deg·|V| ≤ 2·|E| —
  * INTEGER arithmetic, no float density inside the loop), the classic
  * spam-farm / dense-core detector on web link graphs. The best round's
  * |E|/|V| is a ≥½-of-optimum density witness.
  *
  * Scale shape per round: one degree aggregation over the live canonical
  * edges (map-side combined) + two semi-joins to induce the survivor
  * subgraph; the loop's driver state is two scalar counts per round
  * (needed to steer the peel anyway), lineage truncated per round.
  */
object Densest {

  /** Per-round census (round, n_v, n_e) for EXACTLY `rounds` peels
    * (round 0 = the input graph; converged/empty rounds repeat their
    * stats so the row count is fixed — the oracle-replayable parity
    * form, q110 discipline). Isolated survivors count in n_v (they peel
    * next round, per the induced-subgraph definition). */
  def peelCensus(spark: SparkSession, edges: DataFrame,
                 rounds: Int): DataFrame = {
    import spark.implicits._
    var e = edges.select(col("src"), col("dst"))
      .localCheckpoint(eager = true)
    var verts = e.select(col("src").as("vid"))
      .union(e.select(col("dst"))).distinct()
      .localCheckpoint(eager = true)
    val out = Seq.newBuilder[(Long, Long, Long)]
    var nV = verts.count()
    var nE = e.count()
    out += ((0L, nV, nE))
    for (r <- 1 to rounds) {
      val deg = Edges.degrees(Edges.symmetrize(e))
      // keep iff deg·|V| > 2·|E| (strictly above average, exact); on an
      // empty/edgeless graph this keeps nothing — same as the oracle's
      // unrolled stage, so converged rounds replay identically
      val keep = verts
        .join(deg, Seq("vid"), "left")
        .filter(coalesce(col("degree"), lit(0L)) * nV > 2L * nE)
        .select(col("vid"))
        .localCheckpoint(eager = true)
      e = e.join(keep.select(col("vid").as("k1")),
          col("src") === col("k1"), "left_semi")
        .join(keep.select(col("vid").as("k2")),
          col("dst") === col("k2"), "left_semi")
        .localCheckpoint(eager = true)
      verts = keep
      nV = verts.count()
      nE = e.count()
      out += ((r.toLong, nV, nE))
    }
    out.result().toDF("round", "n_v", "n_e")
  }

  /** The densest round's induced subgraph stats: argmax over the census
    * of n_e/n_v (ties → earliest round), with the density rounded for
    * cross-engine compare. */
  def densestRound(census: DataFrame): DataFrame =
    census.filter(col("n_v") > 0)
      .select(col("round"), col("n_v"), col("n_e"),
        round(col("n_e").cast("double") / col("n_v").cast("double"), 6)
          .as("density"))
      .orderBy(col("density").desc, col("round")).limit(1)
}
