package graft.kernels

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Directed dyad/triad census (Holland–Leinhardt '76, reduced to the four
  * classes a link-ranking pipeline consumes): MUTUAL vs ASYMMETRIC dyads
  * (reciprocity — the strongest single edge-quality signal on a web link
  * graph), and TRANSITIVE vs CYCLIC closed triads (feed-forward vs feedback
  * loops — hierarchy vs circularity of the linking structure). The G-Miner
  * pattern app (`apps/graphmatch.cpp`) matches one fixed directed shape per
  * run; the census is the aggregate view over all of them at once.
  *
  * Scale shape: dyads are one self-join on the reversed edge table; closed
  * triads are the standard two-hop wedge join closed by a third edge-join —
  * the same O(E^1.5)-family plan as triangle counting, shuffling on edge
  * endpoints only, with every count fully map-side combinable. No per-seed
  * work, no driver loops; each motif class is a plain aggregate the
  * optimizer pipelines into one stage per join.
  */
object Triads {

  /** @param directed distinct (src, dst) edges, no self-loops
    * @return (motif, cnt): mutual_dyads, asym_dyads, trans_triads
    *         (a→b, b→c, a→c triples), cyclic_triads (rotation-deduped) */
  def census(directed: DataFrame): DataFrame = {
    val d = directed.select(col("src"), col("dst")).distinct()
      .localCheckpoint(eager = true)

    // dyads: canonical unordered pairs carrying 1 or 2 directed edges
    val pairs = d.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("ne"))
    val dyads = pairs.agg(
      sum(when(col("ne") === 2L, 1L).otherwise(0L)).as("mutual"),
      sum(when(col("ne") === 1L, 1L).otherwise(0L)).as("asym"))

    // closed triads: wedge a→b→c closed by a→c (transitive) or c→a
    // (cyclic; a < b && a < c keeps exactly one of the 3 rotations)
    val ab = d.select(col("src").as("a"), col("dst").as("b"))
    val bc = d.select(col("src").as("b"), col("dst").as("c"))
    val wedge = ab.join(bc, "b").filter(col("a") =!= col("c"))
    val trans = wedge.join(
      d.select(col("src").as("a"), col("dst").as("c")), Seq("a", "c"))
      .agg(count(lit(1)).as("n"))
    val cyc = wedge.filter(col("a") < col("b") && col("a") < col("c"))
      .join(d.select(col("src").as("c"), col("dst").as("a")), Seq("a", "c"))
      .agg(count(lit(1)).as("n"))

    val s = d.sparkSession
    import s.implicits._
    Seq("mutual_dyads", "asym_dyads", "trans_triads", "cyclic_triads")
      .toDF("motif")
      .join(
        dyads.select(lit("mutual_dyads").as("motif"), col("mutual").as("cnt"))
          .unionAll(dyads.select(lit("asym_dyads"), col("asym")))
          .unionAll(trans.select(lit("trans_triads"), col("n")))
          .unionAll(cyc.select(lit("cyclic_triads"), col("n"))),
        Seq("motif"), "left")
      .select(col("motif"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }
}
