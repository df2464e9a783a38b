package graft.corpus

import graft.graph.Edges
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** corpus(repo, path, commit, lang, content) → vertices / edges / adj —
  * the derivation layer of the north rule (SURVEY §1.3): vertices are
  * repo/path nodes, edges are co-occurrence links (two path-nodes share a
  * commit; two repo-nodes share a path basename).
  *
  * Everything is a declarative Catalyst plan: the corpus scan projects only
  * the columns each derivation needs (column pruning reaches the parquet
  * scan), pair expansion happens once per group key with a deterministic
  * per-group cap against hub commits (the quadratic-blowup guard of SURVEY
  * §4.3), and vertex ids are stable content-independent 63-bit hashes so a
  * re-derivation over a grown corpus keeps old ids (Iceberg-incremental
  * friendly).
  */
object EdgeDeriver {

  /** Stable positive 63-bit vertex id of a name (mask, not abs: total). */
  private def vid(name: org.apache.spark.sql.Column) =
    xxhash64(name).bitwiseAND(lit(Long.MaxValue))

  /** Path-node name: `repo:path` (a path is scoped by its repo). */
  private def pathName(df: DataFrame) =
    concat_ws(":", col("repo"), col("path"))

  /** vertices(vid, kind, name) for both node kinds, deduplicated.
    * Collision safety (SURVEY §7.4.6) is asserted by [[collisionFree]]. */
  def vertices(corpus: DataFrame): DataFrame = {
    val paths = corpus.select(pathName(corpus).as("name"))
      .distinct().select(vid(col("name")).as("vid"),
        lit("path").as("kind"), col("name"))
    val repos = corpus.select(col("repo").as("name"))
      .distinct().select(vid(col("name")).as("vid"),
        lit("repo").as("kind"), col("name"))
    paths.unionByName(repos)
  }

  /** True iff no two distinct names share a vid (0 false positives
    * required for the exact-match acceptance). Cheap: two distinct-counts. */
  def collisionFree(vertices: DataFrame): Boolean = {
    val r = vertices.agg(
      countDistinct(col("name")).as("names"),
      countDistinct(col("vid")).as("vids")).head()
    r.getLong(0) == r.getLong(1)
  }

  /** Path-level co-occurrence: two path-nodes are linked iff they appear in
    * the same commit; weight = #shared commits. `capPerGroup` bounds the
    * hub-commit pair blowup (deterministic top-K by hash — dropped pairs
    * are a documented, logged approximation at scale). */
  def pathEdges(corpus: DataFrame, minWeight: Long = 1L,
                capPerGroup: Int = 1000): DataFrame =
    Edges.coOccurrence(
      corpus.select(col("commit"),
        vid(pathName(corpus)).as("item")),
      "commit", "item", minWeight, capPerGroup)

  /** Repo-level co-occurrence: two repo-nodes are linked iff they contain a
    * path with the same basename; weight = #shared basenames. */
  def repoEdges(corpus: DataFrame, minWeight: Long = 1L,
                capPerGroup: Int = 1000): DataFrame =
    Edges.coOccurrence(
      corpus.select(
        element_at(split(col("path"), "/"), -1).as("base"),
        vid(col("repo")).as("item")),
      "base", "item", minWeight, capPerGroup)

  /** Combined edge table (src, dst, weight), canonical src < dst, deduped
    * across derivations (weights summed), self-loop-free by construction. */
  def edges(corpus: DataFrame, minWeight: Long = 1L,
            capPerGroup: Int = 1000): DataFrame =
    pathEdges(corpus, 1L, capPerGroup)
      .unionByName(repoEdges(corpus, 1L, capPerGroup))
      .groupBy(col("src"), col("dst"))
      .agg(sum(col("weight")).as("weight"))
      .filter(col("weight") >= minWeight)

  /** Sorted-adjacency CSR blocks of the symmetrized edge table,
    * hash-partitioned by src (the reference's `VertexTable` analog). */
  def adj(edges: DataFrame, partitions: Int): DataFrame =
    Edges.adjacency(Edges.symmetrize(edges))
      .repartition(partitions, col("src"))
}
