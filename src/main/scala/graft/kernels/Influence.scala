package graft.kernels

import graft.graph.Edges
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Influence-maximization seed selection by DegreeDiscountIC (Chen,
  * Wang, Yang KDD'09): greedily pick k spread seeds for the independent-
  * cascade model, discounting each candidate's degree by its already-
  * selected neighbors — dd(v) = d_v − 2t_v − (d_v − t_v)·t_v·p, where t_v
  * counts selected neighbors and p is the propagation probability. The
  * "which repos seed the widest adoption cascade" query over a
  * co-occurrence link graph, and the classic near-Monte-Carlo-quality
  * heuristic that needs no simulation at all.
  *
  * Exactness: dd is held in ppm (dd_ppm = (d−2t)·10⁶ − (d−t)·t·p_ppm),
  * all integer, so every round's argmax (ties to the smaller vid) is
  * bit-replayable by a recursive-CTE oracle carrying the pick list.
  *
  * Scale shape: k rounds, each ONE broadcast-filtered aggregation over
  * the edge fabric (t_v needs only edges into the ≤k selected seeds —
  * an isin literal, no shuffle of the selection) + one distributed
  * argmax (orderBy.limit(1), TakeOrdered — no global sort). Driver state
  * is the k picked (vid, dd) scalars, bounded by construction. */
object Influence {

  /** @param edges undirected unique pairs (src, dst)
    * @param k     number of seeds to select
    * @param pPpm  IC propagation probability in ppm
    * @return (rank 1..k, vid, dd_ppm at selection time) */
  def degreeDiscount(spark: SparkSession, edges: DataFrame,
                     k: Int = 8, pPpm: Long = 100000L): DataFrame = {
    import spark.implicits._
    val sym = Edges.symmetrize(edges).localCheckpoint(eager = true)
    val deg = Edges.degrees(sym).localCheckpoint(eager = true)
    var picks = Vector.empty[(Long, Long, Long)] // (rank, vid, dd_ppm)
    for (r <- 1 to k) {
      val sel = picks.map(_._2)
      val t =
        if (sel.isEmpty)
          deg.select(col("vid"), lit(0L).as("t"))
        else
          sym.filter(col("dst").isin(sel: _*))
            .groupBy(col("src").as("vid"))
            .agg(count(lit(1)).as("t"))
      val best = deg
        .filter(if (sel.isEmpty) lit(true) else !col("vid").isin(sel: _*))
        .join(t, Seq("vid"), "left")
        .withColumn("tv", coalesce(col("t"), lit(0L)))
        .select(col("vid"),
          ((col("degree") - col("tv") * 2L) * 1000000L -
            (col("degree") - col("tv")) * col("tv") * pPpm).as("dd_ppm"))
        .orderBy(col("dd_ppm").desc, col("vid"))
        .limit(1).collect() // exactly one row per round
      picks :+= ((r.toLong, best(0).getLong(0), best(0).getLong(1)))
    }
    picks.toDF("rank", "vid", "dd_ppm")
  }
}
