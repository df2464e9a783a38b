package graft.kernels

import graft.engine.{Checkpointer, IterationMetric, Superstep}
import graft.graph.Edges
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components by hash-min label propagation — the exact semantics
  * of the reference's `subG_hashmin` (`partition/BPartitioner.tpp:90-165`
  * with min-combiner `partition/BDGPartitioner.tpp:259-263`): every vertex
  * starts labeled with its own id, broadcasts its label to neighbors, keeps
  * the minimum it has seen, iterates to fixpoint. Final label = min vertex
  * id of the component.
  *
  * Each superstep is one shuffle join (labels ⋈ edges on the vertex key)
  * plus a min aggregation with automatic map-side combine (the reference's
  * combiner, for free from Catalyst partial aggregation). Converges in
  * O(diameter) supersteps — fine for co-occurrence graphs (small diameter);
  * the state is checkpointed per superstep so lineage stays O(1).
  */
object ConnectedComponents {

  final case class Result(components: DataFrame,
                          metrics: Seq[IterationMetric],
                          iterations: Int,
                          converged: Boolean)

  /** @param sym symmetric edge table (src, dst) — both directions present */
  def run(spark: SparkSession, sym: DataFrame,
          maxIter: Int = 200,
          ckpt: Option[Checkpointer] = None,
          resume: Boolean = false): Result = {
    val edges = sym.select(col("src"), col("dst")).persist()

    def init: DataFrame =
      Edges.vertexIds(edges).select(col("vid"), col("vid").as("component"))

    def step(labels: DataFrame): DataFrame = {
      val msgs = edges
        .join(labels, edges("src") === labels("vid"))
        .select(edges("dst").as("vid"), col("component"))
      val mins = msgs.groupBy("vid").agg(min("component").as("m"))
      labels.join(mins, Seq("vid"), "left")
        .select(col("vid"),
          least(col("component"), coalesce(col("m"), col("component")))
            .as("component"))
    }

    def delta(prev: DataFrame, next: DataFrame): Double =
      next.as("n").join(prev.as("p"), "vid")
        .filter(col("n.component") < col("p.component"))
        .count().toDouble

    val (state, metrics, iters, done) = Superstep.run(
      spark, "cc", init, step, delta, _ == 0.0, maxIter, ckpt, resume)
    edges.unpersist()
    Result(state, metrics, iters, done)
  }
}
