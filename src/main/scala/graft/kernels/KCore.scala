package graft.kernels

import graft.engine.{Checkpointer, IterationMetric, Superstep}
import graft.graph.Edges
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling: repeatedly remove vertices
  * with (induced) degree < k until fixpoint; the survivors are the k-core.
  *
  * This is the community-density primitive behind the reference's CD
  * application (its community definition requires every member to have
  * ≥ K-1 in-community neighbors — `apps/community.cpp:481`, i.e. a k-clique
  * relaxation); peeling is the same BSP substrate as CC (B1: superstep
  * loop, convergence = no vertex removed).
  *
  * Each superstep: two semi-joins (edge survives iff both endpoints do) +
  * a degree count — all shuffles on the vertex key; state (surviving
  * vertices + degrees) is checkpointed, so lineage stays O(1).
  */
object KCore {

  final case class Result(core: DataFrame,
                          metrics: Seq[IterationMetric],
                          iterations: Int,
                          converged: Boolean)

  /** @param sym symmetric edge table (src, dst)
    * @return surviving (vid, degree) rows of the k-core (degree = induced) */
  def run(spark: SparkSession, sym: DataFrame, k: Int,
          maxIter: Int = 100,
          ckpt: Option[Checkpointer] = None,
          resume: Boolean = false): Result = {
    // hash-partition the persisted edge table on the join key: every
    // superstep's state join then reuses this partitioning instead of
    // re-shuffling |E| rows per iteration (state is already hash(vid)-
    // partitioned by the previous aggregation)
    val edges = sym.select(col("src"), col("dst"))
      .repartition(col("src")).persist()

    def init: DataFrame =
      Edges.degrees(edges).filter(col("degree") >= k)

    def step(survivors: DataFrame): DataFrame = {
      val v = survivors.select(col("vid"))
      val induced = edges
        .join(v.withColumnRenamed("vid", "src").hint("SHUFFLE_HASH"),
          Seq("src"), "left_semi")
        .join(v.withColumnRenamed("vid", "dst").hint("SHUFFLE_HASH"),
          Seq("dst"), "left_semi")
      Edges.degrees(induced).filter(col("degree") >= k)
    }

    // each state is counted ONCE (the previous iteration's count is carried
    // forward) — round 1 recounted both sides every superstep, 3 count jobs
    // per iteration including Superstep's own rows metric
    var lastRows = -1L
    def delta(prev: DataFrame, next: DataFrame): Double = {
      val p = if (lastRows >= 0) lastRows else prev.count()
      val n = next.count() // cheap: next is already materialized
      lastRows = n
      (p - n).toDouble
    }

    val (state, metrics, iters, done) = Superstep.run(
      spark, s"kcore$k", init, step, delta, _ == 0.0, maxIter, ckpt, resume)
    edges.unpersist()
    Result(state, metrics, iters, done)
  }
}
