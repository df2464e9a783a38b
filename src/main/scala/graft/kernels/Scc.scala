package graft.kernels

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Strongly connected components on a DIRECTED link graph — the
  * trim + forward-min-coloring + backward-sweep algorithm (FW-BW-Trim,
  * Hong et al. PPoPP'13 / the "coloring" SCC of Orzan's thesis),
  * re-expressed set-at-a-time so every phase is a Catalyst join+agg
  * rather than a per-vertex DFS (Tarjan is inherently sequential and
  * cannot ship on a cluster).
  *
  * Directedness is the one thing the reference's hash-min CC
  * (`partition/BPartitioner.tpp:90-165`) discards — repo dependency
  * edges (A imports B) are not symmetric, and the SCC decomposition
  * (mutual-reachability classes, e.g. circular-dependency clusters) is
  * the canonical directed analog the engine was missing.
  *
  * Phases, per outer round:
  *  1. TRIM to fixpoint: a vertex with no in-edges or no out-edges in
  *     the remaining subgraph can sit on no cycle → it is its own
  *     singleton SCC. Peeling these repeatedly dissolves the DAG
  *     portion of the graph (most of a web/link graph) in a few
  *     semi-join rounds, leaving only the cyclic core — without it the
  *     coloring phase would peel a long dependency chain one vertex
  *     per round.
  *  2. FORWARD COLORING to fixpoint: color(v) = min vertex id that
  *     reaches v (directed hash-min — the CC superstep with the edge
  *     table NOT symmetrized). One shuffle-hash join + map-side-combined
  *     min aggregation per superstep, state localCheckpoint-truncated
  *     ([[graft.engine.Superstep]] discipline).
  *  3. BACKWARD SWEEP within colors: from each root r (color(r) = r),
  *     walk edges BACKWARD but only across same-colored endpoints; the
  *     vertices reached are exactly SCC(r) — they reach r (backward
  *     path = forward path to r) and r reaches them (their color says
  *     the min-reacher is r... r reaches everything it colors).
  *     Every root's sweep runs in the SAME job (the root set is a
  *     DataFrame, not a loop over roots).
  *  4. The identified SCCs leave the graph; repeat on the remainder.
  *     Each round removes at least every root's SCC (the global min of
  *     every weak component is always a root), so the round count is
  *     bounded by the longest chain of nested SCC "layers" — small in
  *     practice once TRIM eats the acyclic mass.
  *
  * 100 TB posture: trim rounds are semi-joins on the shrinking vertex
  * set (broadcast once it fits); coloring shuffles only the remaining
  * cyclic core; no phase collects vertices to the driver; per-round
  * state is checkpoint-truncated so lineage stays O(1).
  */
object Scc {

  /** Deterministic sha-steered orientation of an undirected canonical
    * edge table (src < dst): h = sha60("dir:src:dst") mod 3 picks
    * src→dst (h=0), dst→src (h=1), or both (h=2). Gives a reproducible
    * directed graph with non-trivial SCCs from any undirected
    * derivation, and the rule is plain SQL so DuckDB derives the exact
    * same digraph (the q75/q92 sha-replay discipline). */
  def shaDirect(edges: DataFrame, salt: String = "dir"): DataFrame = {
    val h = pmod(graft.text.Dedup.shaTokenHash60(
      concat(lit(salt + ":"), col("src").cast("string"),
        lit(":"), col("dst").cast("string"))), lit(3L))
    val fwd = edges.select(col("src"), col("dst"), h.as("h"))
    fwd.filter(col("h") =!= 1)
      .select(col("src"), col("dst"))
      .unionAll(fwd.filter(col("h") =!= 0)
        .select(col("dst").as("src"), col("src").as("dst")))
  }

  /** (vid, scc_id) for every vertex of the directed edge table;
    * scc_id = min vertex id of the strongly connected component. */
  def run(spark: SparkSession, dedges: DataFrame,
          maxRounds: Int = 60, maxSupersteps: Int = 200): DataFrame = {
    import spark.implicits._
    var edges = dedges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(eager = true)
    var verts = edges.select(col("src").as("vid"))
      .unionAll(edges.select(col("dst").as("vid"))).distinct()
      .localCheckpoint(eager = true)
    var remaining = verts.count()
    val pieces = Seq.newBuilder[DataFrame]
    var round = 0

    // drop removed vertices from both tables. Lazy by default — trim
    // composes several cheap peels per materialization (the flood
    // `checkEvery` trick: each extra driver round-trip costs more than
    // the narrowed plan it saves on local[*] AND on a real cluster,
    // where a fixpoint loop's small jobs are scheduler-latency-bound)
    def shrink(removed: DataFrame): Unit = {
      edges = edges
        .join(removed.hint("SHUFFLE_HASH"),
          edges("src") === removed("vid"), "left_anti")
        .join(removed.hint("SHUFFLE_HASH"),
          edges("dst") === removed("vid"), "left_anti")
      verts = verts.join(removed, Seq("vid"), "left_anti")
    }
    def materialize(): Unit = {
      edges = edges.localCheckpoint(eager = true)
      verts = verts.localCheckpoint(eager = true)
    }

    while (remaining > 0 && round < maxRounds) {
      round += 1
      // --- 1. trim to fixpoint: no-in or no-out ⇒ singleton SCC ---
      var trimming = true
      var sinceMat = 0
      while (trimming && remaining > 0) {
        val both = edges.select(col("src").as("vid")).distinct()
          .join(edges.select(col("dst").as("vid")).distinct(), "vid")
        val dead = verts.join(both, Seq("vid"), "left_anti")
          .localCheckpoint(eager = true)
        val nDead = dead.count()
        if (nDead == 0) trimming = false
        else {
          if (sys.env.contains("SPARK_GRAFT_SCC_DEBUG"))
            System.err.println(s"[scc] r$round trim dead=$nDead")
          pieces += dead.select(col("vid"), col("vid").as("scc_id"))
          shrink(dead)
          remaining -= nDead
          sinceMat += 1
          if (sinceMat == 2) { materialize(); sinceMat = 0 }
        }
      }
      if (sinceMat > 0) materialize()
      if (remaining > 0) {
        // --- 2. forward min-coloring to fixpoint (directed hash-min) ---
        var colors = verts.select(col("vid"), col("vid").as("color"))
          .localCheckpoint(eager = true)
        var changed = 1L
        var steps = 0
        while (changed > 0 && steps < maxSupersteps) {
          steps += 1
          val msgs = edges
            .join(colors.hint("SHUFFLE_HASH"),
              edges("src") === colors("vid"))
            .select(edges("dst").as("vid"), col("color"))
          val mins = msgs.groupBy("vid").agg(min("color").as("m"))
          val next = colors.select(col("vid"), col("color"))
            .join(mins.hint("SHUFFLE_HASH"), Seq("vid"), "left")
            .select(col("vid"),
              least(col("color"), coalesce(col("m"), col("color")))
                .as("color"),
              (col("m").isNotNull && col("m") < col("color"))
                .as("changed"))
            .localCheckpoint(eager = true)
          changed = next.filter(col("changed")).count()
          colors = next.select(col("vid"), col("color"))
        }
        if (sys.env.contains("SPARK_GRAFT_SCC_DEBUG"))
          System.err.println(s"[scc] r$round coloring steps=$steps n=$remaining")
        require(changed == 0, s"scc coloring did not converge " +
          s"in $maxSupersteps supersteps")
        // --- 3. backward sweep from roots within same-color region ---
        val cSrc = colors.select(col("vid").as("src"),
          col("color").as("c_src"))
        val cDst = colors.select(col("vid").as("dst"),
          col("color").as("c_dst"))
        val sameColor = edges.join(cSrc.hint("SHUFFLE_HASH"), "src")
          .join(cDst.hint("SHUFFLE_HASH"), "dst")
          .filter(col("c_src") === col("c_dst"))
          .select(col("src"), col("dst"), col("c_src").as("color"))
          .localCheckpoint(eager = true)
        var reached = colors.filter(col("vid") === col("color"))
          .select(col("vid"), col("color"))
          .localCheckpoint(eager = true)
        var grew = 1L
        var bSteps = 0
        while (grew > 0 && bSteps < maxSupersteps) {
          bSteps += 1
          val nbrs = sameColor
            .join(reached.hint("SHUFFLE_HASH"),
              sameColor("dst") === reached("vid") &&
                sameColor("color") === reached("color"))
            .select(sameColor("src").as("vid"),
              sameColor("color").as("color"))
            .distinct()
          val fresh = nbrs.join(reached, Seq("vid"), "left_anti")
            .localCheckpoint(eager = true)
          grew = fresh.count()
          if (grew > 0) reached = reached.unionAll(fresh)
        }
        if (sys.env.contains("SPARK_GRAFT_SCC_DEBUG"))
          System.err.println(s"[scc] r$round bwd steps=$bSteps")
        require(grew == 0,
          s"scc backward sweep did not converge in $maxSupersteps steps")
        val found = reached.localCheckpoint(eager = true)
        pieces += found.select(col("vid"), col("color").as("scc_id"))
        shrink(found.select(col("vid")))
        remaining -= found.count()
        materialize()
      }
    }
    require(remaining == 0, s"scc did not finish in $maxRounds rounds")
    if (sys.env.contains("SPARK_GRAFT_SCC_DEBUG"))
      System.err.println(s"[scc] outer rounds: $round")
    val ps = pieces.result()
    if (ps.isEmpty)
      Seq.empty[(Long, Long)].toDF("vid", "scc_id")
    else ps.reduce(_ unionAll _).localCheckpoint(eager = true)
  }
}
