package graft.kernels

import graft.graph.Edges
import graft.text.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic random-walk corpus generation (DeepWalk-style) — the
  * graph-embedding training-data op: one fixed-length uniform walk per
  * vertex, emitted as (walk, step, vid) rows ready for skip-gram pairing.
  *
  * Determinism discipline: the "random" neighbor choice at step s is
  * `sha256(salt:walk:s:cur) mod degree(cur)` into the SORTED adjacency
  * array — the same sha-parity trick as the seeded MinHash permutations
  * and the q60 sampling keeps, so a SQL oracle replays every step
  * bit-exactly and reruns are reproducible across cluster sizes (no RNG
  * state, no per-partition seeding).
  *
  * Scale shape (SURVEY §2.8 discipline): the sorted adjacency table is
  * built once ([[Edges.adjacency]] — one shuffle) and persisted; each of
  * the `length` steps is one join of the frontier state against it with
  * the state localCheckpoint-truncated per step (O(1) lineage, same as
  * the superstep kernels). Walk state is (walk, step, cur) — constant
  * width, no path accumulation; hub vertices cost nothing extra because
  * the walk carries one row per walk regardless of degree.
  */
object RandomWalk {

  /** One walk per vertex of the symmetrized graph, `length` steps
    * (output has length+1 rows per walk, steps 0..length).
    * @param edges canonical undirected edge table (src < dst, distinct) */
  def walks(edges: DataFrame, length: Int,
            salt: String = "walk"): DataFrame = {
    val sym = Edges.symmetrize(edges)
    val adj = Edges.adjacency(sym).withColumnRenamed("src", "cur").persist()
    var state = Edges.vertexIds(sym)
      .select(col("vid").as("walk"), lit(0L).as("step"),
        col("vid").as("cur"))
      .localCheckpoint(eager = true)
    var out = state
    for (s <- 1 to length) {
      val h = Dedup.shaTokenHash60(concat(
        lit(salt + ":"), col("walk").cast("string"),
        lit(":"), lit(s.toLong).cast("string"),
        lit(":"), col("cur").cast("string")))
      state = state.join(adj, "cur")
        .select(col("walk"), lit(s.toLong).as("step"),
          element_at(col("adj"),
            (pmod(h, size(col("adj"))) + 1).cast("int")).as("cur"))
        .localCheckpoint(eager = true)
      out = out.union(state)
    }
    adj.unpersist()
    out.select(col("walk"), col("step"), col("cur").as("vid"))
  }

  /** Skip-gram training pairs from [[walks]] output: co-occurring
    * (center, context) vids within `window` steps on the same walk,
    * weighted by pair count — the corpus a word2vec-style embedding
    * trainer consumes. One self-join on the walk id (walks are short,
    * the join is per-walk local after one shuffle). */
  def skipGramPairs(walkRows: DataFrame, window: Int): DataFrame =
    walkRows.as("a")
      .join(walkRows.as("b"),
        col("a.walk") === col("b.walk") &&
          col("a.step") =!= col("b.step") &&
          abs(col("a.step") - col("b.step")) <= window)
      .groupBy(col("a.vid").as("center"), col("b.vid").as("context"))
      .agg(count(lit(1)).as("pairs"))
}
