package graft.kernels

import graft.engine.{Checkpointer, IterationMetric, Superstep}
import graft.graph.Edges
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synchronous label propagation: every vertex starts with its own id as
  * label; each superstep it adopts the MODE of its neighbors' labels, ties
  * broken by the smallest label. Deterministic by construction (SURVEY
  * §7.4.3) — the reference's hash-min pass (`partition/BPartitioner.tpp:
  * 90-165`) is the min-label special case of this kernel.
  *
  * The mode-with-min-tiebreak is pure builtin aggregation (two-phase, per
  * SURVEY §7.3's preferred fallback): count labels per (vid, label), then
  * per vid take max of struct(count, -label) — lexicographic struct
  * ordering gives greatest count, then smallest label. Both aggregations
  * get map-side partial combine from Catalyst.
  */
object LabelPropagation {

  final case class Result(labels: DataFrame,
                          metrics: Seq[IterationMetric],
                          iterations: Int,
                          converged: Boolean)

  /** @param sym symmetric edge table (src, dst)
    * @param iterations fixed superstep count (synchronous LP need not
    *        converge — fixed budget keeps results well-defined); stops
    *        early at a fixpoint */
  def run(spark: SparkSession, sym: DataFrame,
          iterations: Int,
          ckpt: Option[Checkpointer] = None,
          resume: Boolean = false): Result = {
    // hash-partition the persisted edge table on the join key: every
    // superstep's state join then reuses this partitioning instead of
    // re-shuffling |E| rows per iteration (state is already hash(vid)-
    // partitioned by the previous aggregation)
    val edges = sym.select(col("src"), col("dst"))
      .repartition(col("src")).persist()

    def init: DataFrame =
      Edges.vertexIds(edges).select(col("vid"), col("vid").as("label"))

    def step(labels: DataFrame): DataFrame = {
      val msgs = edges
        .join(labels.hint("SHUFFLE_HASH"), edges("src") === labels("vid"))
        .select(edges("dst").as("vid"), col("label"))
      val hist = msgs.groupBy(col("vid"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      hist.groupBy("vid")
        .agg(max(struct(col("cnt").as("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("vid"), (-col("m.nl")).as("label"))
    }

    def delta(prev: DataFrame, next: DataFrame): Double =
      next.as("n").join(prev.as("p"), "vid")
        .filter(col("n.label") =!= col("p.label")).count().toDouble

    // countRows=false: the state is already materialized eagerly by the
    // checkpoint, no query consumes LP's rows metric, and the count job
    // costs a driver round-trip per superstep
    val (state, metrics, iters, done) = Superstep.run(
      spark, "lp", init, step, delta, _ == 0.0, iterations, ckpt, resume,
      countRows = false)
    edges.unpersist()
    Result(state, metrics, iters, done)
  }

  /** WEIGHTED label propagation: the adopted label maximizes the SUM of
    * incident edge weights instead of the neighbor count (ties: smallest
    * label) — communities follow co-occurrence STRENGTH, not just
    * adjacency (the multi_attr-format analog of [[run]]; reference
    * weighted fabric per SURVEY §1.2). Integer weights keep every
    * aggregate exact, so fixed-round runs hash-match a SQL replay.
    * Same two-phase mode shape: sum per (vid, label), then
    * max(struct(wsum, −label)). */
  def runWeighted(spark: SparkSession, symW: DataFrame,
                  iterations: Int): Result = {
    val edges = symW.select(col("src"), col("dst"), col("weight"))
      .repartition(col("src")).persist()

    def init: DataFrame =
      Edges.vertexIds(edges).select(col("vid"), col("vid").as("label"))

    def step(labels: DataFrame): DataFrame = {
      val msgs = edges
        .join(labels.hint("SHUFFLE_HASH"), edges("src") === labels("vid"))
        .select(edges("dst").as("vid"), col("label"), col("weight"))
      val hist = msgs.groupBy(col("vid"), col("label"))
        .agg(sum(col("weight")).as("w"))
      hist.groupBy("vid")
        .agg(max(struct(col("w").as("c"), (-col("label")).as("nl")))
          .as("m"))
        .select(col("vid"), (-col("m.nl")).as("label"))
    }

    def delta(prev: DataFrame, next: DataFrame): Double =
      next.as("n").join(prev.as("p"), "vid")
        .filter(col("n.label") =!= col("p.label")).count().toDouble

    val (state, metrics, iters, done) = Superstep.run(
      spark, "lpw", init, step, delta, _ == 0.0, iterations,
      ckpt = None, resume = false, countRows = false)
    edges.unpersist()
    Result(state, metrics, iters, done)
  }
}
