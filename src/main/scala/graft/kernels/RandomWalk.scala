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

  /** Node2vec-biased walks (Grover–Leskovec 2016) — second-order walks
    * whose step from (prev → cur) weighs each candidate x by
    *  - `wBack`  if x == prev            (return, α = 1/p),
    *  - `wStay`  if x is adjacent to prev (distance 1, α = 1),
    *  - `wFar`   otherwise                (distance 2, α = 1/q);
    * the defaults (1, 2, 1) are p = q = 2 scaled to INTEGERS so the
    * cumulative-weight draw is exact. Step 1 is uniform (no prev), as in
    * [[walks]]. The draw at step s is sha256(salt:walk:s:prev:cur) mod
    * Σw into the weight CDF over ascending candidate ids — every step is
    * SQL-replayable and identical on any cluster size.
    *
    * Scale shape, per step: one state⋈adjacency expansion (bounded by
    * degree(cur) — the candidate fan-out any second-order walk pays), one
    * canonical-pair membership join against the edge set to flag
    * distance-1 candidates, one per-walk window (keyed by walk id —
    * millions of walks = full parallelism, each window ≤ degree rows),
    * state checkpoint-truncated to O(1) lineage. */
  def node2vecWalks(edges: DataFrame, length: Int,
                    wBack: Long = 1L, wStay: Long = 2L, wFar: Long = 1L,
                    salt: String = "n2v"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = edges.select(col("src"), col("dst"))
    val sym = Edges.symmetrize(e).persist()
    val adj = Edges.adjacency(sym).withColumnRenamed("src", "cur").persist()
    val start = Edges.vertexIds(sym)
      .select(col("vid").as("walk"), col("vid").as("cur"))
      .localCheckpoint(eager = true)
    var out = start.select(col("walk"), lit(0L).as("step"), col("cur"))
    // step 1: uniform pick into the sorted adjacency (no prev yet)
    val h1 = Dedup.shaTokenHash60(concat(
      lit(salt + ":"), col("walk").cast("string"), lit(":1:"),
      col("cur").cast("string")))
    var state = start.join(adj, "cur")
      .select(col("walk"), col("cur").as("prev"),
        element_at(col("adj"),
          (pmod(h1, size(col("adj"))) + 1).cast("int")).as("cur"))
      .localCheckpoint(eager = true)
    out = out.union(state.select(col("walk"), lit(1L).as("step"),
      col("cur")))
    for (s <- 2 to length) {
      val cand = state.join(
        sym.withColumnRenamed("src", "cur").withColumnRenamed("dst", "x"),
        "cur")
      val flagged = cand.join(
        e.select(col("src").as("ps"), col("dst").as("xs")),
        least(col("prev"), col("x")) === col("ps") &&
          greatest(col("prev"), col("x")) === col("xs"), "left")
      val w = when(col("x") === col("prev"), lit(wBack))
        .when(col("ps").isNotNull, lit(wStay))
        .otherwise(lit(wFar))
      val cumWin = Window.partitionBy(col("walk")).orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val totWin = Window.partitionBy(col("walk"))
      val r = pmod(Dedup.shaTokenHash60(concat(
        lit(salt + ":"), col("walk").cast("string"),
        lit(s":$s:"), col("prev").cast("string"),
        lit(":"), col("cur").cast("string"))), col("tot"))
      state = flagged.withColumn("w", w)
        .withColumn("cum", sum(col("w")).over(cumWin))
        .withColumn("tot", sum(col("w")).over(totWin))
        .filter(r >= col("cum") - col("w") && r < col("cum"))
        .select(col("walk"), col("cur").as("prev"), col("x").as("cur"))
        .localCheckpoint(eager = true)
      out = out.union(state.select(col("walk"), lit(s.toLong).as("step"),
        col("cur")))
    }
    val result = out.select(col("walk"), col("step"),
      col("cur").as("vid")).localCheckpoint(eager = true)
    adj.unpersist(); sym.unpersist()
    result
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
