package graft.kernels

import graft.graph.Edges
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sweep-cut local clustering (Andersen–Chung–Lang, FOCS'06): given a
  * personalized-PageRank vector seeded at a query set, order vertices by
  * degree-normalized rank and report the conductance of every prefix —
  * the prefix minimizing it is the provably-good local cluster around
  * the seeds. This is the standard local graph-partitioning primitive
  * the reference's Voronoi/BDG layout family approximates globally
  * (`partition/BPartitioner.tpp:299-510` grows balanced blocks by
  * flooding; the sweep grows ONE quality-bounded block from a seed), and
  * it composes two already-verified stages: the PPR kernel
  * ([[PageRank.run]] `personalized`) and the conductance metric
  * ([[GraphStats.conductance]]).
  *
  * Scale shape: the top-`limit` candidate selection is a distributed
  * TakeOrdered (no global window over |V|); every window after that runs
  * over at most `limit` rows by construction; the prefix-internal-edge
  * count joins the ≤`limit`-row position table (broadcast) into the edge
  * scan ONCE — the edge table never shuffles. At 100 TB the sweep is one
  * edge-scan-sized job plus O(limit) bookkeeping.
  *
  * Determinism: callers pass ranks already rounded (round 8, the q10/q62
  * oracle discipline); the order is (rank/degree DESC, vid) — total, so
  * the replay sorts identically from identical rounded inputs.
  */
object SweepCut {

  /** Conductance sweep over `ranks` (vid, rank). Returns one row per
    * prefix k = 1..limit: (k, vid, cut_edges, volume, conductance) where
    * vid is the k-th vertex added, cut/volume are exact integers over
    * `sym`, and conductance = cut / min(vol, 2m − vol) (NULL when the
    * prefix absorbs the whole graph).
    * @param sym symmetric edge table (src, dst), both directions present
    * @param ranks (vid, rank: double) — vertices with rank <= 0 ignored */
  def sweep(sym: DataFrame, ranks: DataFrame, limit: Int = 150): DataFrame = {
    val deg = Edges.degrees(sym) // (vid, degree)
    val m2 = sym.count() // 2m, one bounded scalar job
    // distributed top-L by degree-normalized rank; materialized so the
    // single-partition windows below run over the L-row result, never
    // the full vertex set
    val cand = ranks.filter(col("rank") > 0)
      .join(deg, Seq("vid"))
      .withColumn("ratio", col("rank") / col("degree"))
      .orderBy(col("ratio").desc, col("vid"))
      .limit(limit)
      .localCheckpoint(eager = true)
    val pos = cand
      .withColumn("k", row_number().over(
        Window.orderBy(col("ratio").desc, col("vid"))))
      .select(col("vid"), col("degree"), col("k"))
    // an edge is internal to prefix k iff BOTH endpoint positions <= k:
    // charge it to greatest(pos_src, pos_dst) and prefix-sum; endpoints
    // outside the top-L are outside every prefix (inner join drops them)
    val a = broadcast(pos.select(col("vid").as("sv"), col("k").as("ka")))
    val b = broadcast(pos.select(col("vid").as("dv"), col("k").as("kb")))
    val internal = sym
      .join(a, sym("src") === a("sv"))
      .join(b, sym("dst") === b("dv"))
      .select(greatest(col("ka"), col("kb")).as("kk"))
      .groupBy(col("kk")).agg(count(lit(1)).as("cnt"))
    val cum = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val denom = least(col("vol"), lit(m2) - col("vol"))
    pos.join(internal, pos("k") === internal("kk"), "left")
      .withColumn("vol", sum(col("degree")).over(cum))
      .withColumn("icum", coalesce(sum(col("cnt")).over(cum), lit(0L)))
      .select(col("k"), col("vid"),
        (col("vol") - col("icum")).as("cut_edges"),
        col("vol").as("volume"),
        round((col("vol") - col("icum")).cast("double")
          / when(denom === 0, lit(null)).otherwise(denom), 8)
          .as("conductance"))
  }
}
