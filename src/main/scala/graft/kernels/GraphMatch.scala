package graft.kernels

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Label-constrained pattern matching — the Spark realization of the
  * reference's GM application (`apps/graphmatch.cpp:233-437`: an a-vertex
  * joins its b/c-labeled neighbors hop by hop, backtracking to count
  * matches). Set-at-a-time, the pattern becomes a multiway equi-join chain
  * on a labeled edge table with a label filter per hop (SURVEY §2.3 J5) —
  * exactly what Catalyst join planning + AQE are built for; the label
  * dimension is broadcast (J7).
  *
  * Semantics: count subgraph PATH instances (v1, …, vk) where consecutive
  * vertices are adjacent in the symmetric edge table, label(vi) = Li, and
  * all vertices are pairwise distinct (true subgraph embedding, not a
  * homomorphism — matches the reference's distinct-vertex backtracking,
  * `apps/graphmatch.cpp:148-231`).
  */
object GraphMatch {

  /** All embeddings of a labeled path pattern: columns v1..vk.
    * @param verts  (vid, label)
    * @param sym    symmetric edge table (src, dst)
    * @param labels hop labels L1..Lk (k >= 1)
    */
  def pathMatches(verts: DataFrame, sym: DataFrame,
                  labels: Seq[String]): DataFrame = {
    require(labels.nonEmpty)
    val lab = verts.select(col("vid"), col("label"))
    def hop(i: Int): DataFrame = broadcast(
      lab.filter(col("label") === labels(i - 1))
        .select(col("vid").as(s"v$i")))
    var m = hop(1)
    for (i <- 2 to labels.size) {
      val e = sym.select(col("src").as(s"v${i - 1}"), col("dst").as(s"v$i"))
      val distinctness: Column = (1 to i - 2)
        .map(j => col(s"v$j") =!= col(s"v$i"))
        .foldLeft(lit(true))(_ && _)
      m = m.join(e, s"v${i - 1}")
        .join(hop(i), Seq(s"v$i"))
        .filter(distinctness)
        .select((1 to i).map(j => col(s"v$j")): _*)
    }
    m
  }

  /** Count of embeddings (the reference's aggregated match count —
    * EuroSys Table 4's correctness numbers are exactly this, per pattern). */
  def countPath(verts: DataFrame, sym: DataFrame,
                labels: Seq[String]): DataFrame =
    pathMatches(verts, sym, labels).agg(count(lit(1)).as("matches"))

  /** The reference GM demo's TREE pattern (`apps/graphmatch.cpp:233-437`):
    * root labeled `la` with two children labeled `lb` and `lc`, and the
    * `lb`-child has its own child labeled `ld`; all four vertices
    * pairwise distinct. Embeddings (a, b, c, d) as a 4-way join chain. */
  def treeMatches(verts: DataFrame, sym: DataFrame,
                  la: String, lb: String, lc: String, ld: String)
      : DataFrame = {
    val lab = verts.select(col("vid"), col("label"))
    def labeled(l: String, as: String) = broadcast(
      lab.filter(col("label") === l).select(col("vid").as(as)))
    def edge(x: String, y: String) =
      sym.select(col("src").as(x), col("dst").as(y))
    labeled(la, "a")
      .join(edge("a", "b"), "a").join(labeled(lb, "b"), Seq("b"))
      .join(edge("a", "c"), "a").join(labeled(lc, "c"), Seq("c"))
      .join(edge("b", "d"), "b").join(labeled(ld, "d"), Seq("d"))
      .filter(col("b") =!= col("c") && col("a") =!= col("d") &&
        col("c") =!= col("d"))
      .select(col("a"), col("b"), col("c"), col("d"))
  }

  /** Aggregated tree-pattern match count. */
  def countTree(verts: DataFrame, sym: DataFrame,
                la: String, lb: String, lc: String, ld: String): DataFrame =
    treeMatches(verts, sym, la, lb, lc, ld)
      .agg(count(lit(1)).as("matches"))
}
