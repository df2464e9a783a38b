package graft.kernels

import graft.graph.Edges
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Common-neighbor link prediction — top-k candidate edges per vertex.
  *
  * The classic link-graph feature for training pipelines ("which repos
  * will co-occur next"): score every NON-edge pair at distance 2 by its
  * common-neighbor count, keep each vertex's top-k. Built entirely on the
  * engine's co-occurrence derivation: a wedge center IS a shared group
  * (`Edges.coOccurrence` with group = the center vertex), so the heavy
  * step is the one grouped self-join the derivation pipeline already
  * bounds and the oracle already replays (SURVEY §1.3).
  *
  * Scale shape: one shuffle on the center key for the wedge join, one
  * count aggregation on the pair key, an anti-join against the existing
  * edge set, and a per-vertex top-k window (shuffled by vertex — no
  * global single-task window). `capPerCenter` bounds the quadratic wedge
  * expansion of hub centers exactly like the derivation's `capPerGroup`
  * (deterministic hash top-K, a documented approximation for power-law
  * hubs); the default keeps the score exact, which is what the q70
  * oracle replays.
  */
object LinkPredict {

  /** (vid, cand, cn, rnk): for each vertex, its top-k non-neighbor
    * candidates by common-neighbor count (ties to the lower candidate id).
    * @param edges canonical undirected edge table (src < dst, distinct) */
  def commonNeighbors(edges: DataFrame, topK: Int,
                      capPerCenter: Int = Int.MaxValue): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    // pairs of neighbors sharing a center; weight = #common neighbors
    val cn = Edges.coOccurrence(Edges.symmetrize(e), "src", "dst",
        minWeight = 1L, capPerGroup = capPerCenter)
      .withColumnRenamed("weight", "cn")
    // existing edges are not candidates (both tables are canonical)
    val cand = cn.join(e, Seq("src", "dst"), "left_anti")
    val bi = cand.select(col("src").as("vid"), col("dst").as("cand"),
        col("cn"))
      .union(cand.select(col("dst").as("vid"), col("src").as("cand"),
        col("cn")))
    val w = Window.partitionBy(col("vid"))
      .orderBy(col("cn").desc, col("cand"))
    bi.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topK)
  }
}
