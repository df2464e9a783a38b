package graft.kernels

import graft.graph.Edges
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting via oriented adjacency intersection — the semantics of
  * the reference's TC kernel (`apps/trianglecount.cpp:127-163`: each vertex
  * keeps only higher neighbors, a triangle (u,i,j) is counted once at its
  * smallest corner by intersecting sorted adjacency suffixes; orientation
  * pruning at `:303-331`).
  *
  * Set-at-a-time translation: orient each edge, build sorted out-adjacency
  * arrays once, then for every oriented edge (u,v) count
  * |N⁺(u) ∩ N⁺(v)| with `array_intersect` — one shuffle to build `adj`,
  * two co-partitioned joins, no iteration.
  *
  * Skew (SURVEY §4.3): with degree-orientation (edges point from the lower-
  * (degree,id) endpoint to the higher) every out-adjacency is O(√E) on any
  * graph, so hub vertices cannot blow up an intersection — same total as
  * id-orientation (the triangle set is orientation-invariant) with an
  * O(E^1.5) work bound.
  */
object TriangleCount {

  /** Triangle triples (a, b, c) — one row per triangle, corners unordered
    * (set semantics; each triangle appears exactly once).
    * @param edges canonical distinct undirected edge table (src < dst)
    * @param byDegree orient by (degree, id) [scale path] vs by id */
  def triangles(edges: DataFrame, byDegree: Boolean = true): DataFrame = {
    // no persist: `e` feeds the adj aggregation and the probe side of the
    // first join, BOTH exchanged on hash(src) — Catalyst's ReusedExchange
    // dedupes them (verified in the plan), and a long-lived session keeps
    // no stray cached blocks (round-1 leaked this persist)
    val e = (if (byDegree) Edges.orientByDegree(edges)
             else edges.select(col("src"), col("dst")))
    val adj = e.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("adj"))
    val withU = e.join(adj.withColumnRenamed("src", "u"),
      e("src") === col("u")).select(e("src"), e("dst"), col("adj").as("adjU"))
    val both = withU.join(
      adj.withColumnRenamed("src", "v").withColumnRenamed("adj", "adjV"),
      withU("dst") === col("v"))
      .select(col("src"), col("dst"),
        array_intersect(col("adjU"), col("adjV")).as("common"))
    val t = both.select(col("src").as("a"), col("dst").as("b"),
      explode(col("common")).as("c"))
    t
  }

  /** Per-oriented-edge intersection sizes (src, dst, ncommon) — the count
    * fabric, WITHOUT materializing a row per triangle. Uses the native
    * codegen'd [[graft.functions.SortedIntersectCount]] merge loop over the
    * sorted adjacency arrays (zero allocation per row, vs the hash-set
    * materialization inside builtin `array_intersect`). */
  private def commonCounts(edges: DataFrame, byDegree: Boolean): DataFrame = {
    // unpersisted for the same ReusedExchange reason as [[triangles]]
    val e = (if (byDegree) Edges.orientByDegree(edges)
             else edges.select(col("src"), col("dst")))
    graft.functions.GraftFunctions.ensureRegistered(e.sparkSession)
    val adj = e.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("adj"))
    e.join(adj.withColumnRenamed("src", "u"), e("src") === col("u"))
      .select(e("src"), e("dst"), col("adj").as("adjU"))
      .join(adj.withColumnRenamed("src", "v").withColumnRenamed("adj", "adjV"),
        col("dst") === col("v"))
      .select(col("src"), col("dst"),
        call_function(graft.functions.GraftFunctions.Name,
          col("adjU"), col("adjV")).as("ncommon"))
  }

  /** Total triangle count as a one-row DataFrame (reference's CountAgg,
    * `apps/trianglecount.cpp:50-119`). Sums per-edge intersection SIZES —
    * never materializes a per-triangle row, so a clique-heavy graph with
    * billions of triangles costs O(E^1.5) intersection work and O(E)
    * rows, not O(#triangles). */
  def total(edges: DataFrame, byDegree: Boolean = true): DataFrame =
    commonCounts(edges, byDegree)
      .agg(coalesce(sum(col("ncommon")), lit(0L)).as("triangles"))

  /** Per-vertex triangle participation counts (vid, tc) — vertices in at
    * least one triangle. */
  def perVertex(edges: DataFrame, byDegree: Boolean = true): DataFrame = {
    val t = triangles(edges, byDegree)
    t.select(col("a").as("vid"))
      .union(t.select(col("b").as("vid")))
      .union(t.select(col("c").as("vid")))
      .groupBy("vid").agg(count(lit(1)).as("tc"))
  }
}
