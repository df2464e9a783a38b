package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Decision-stump (depth-1 CART) training inside the engine: find the
  * best (feature, threshold) axis split of a binary label by exact
  * weighted Gini impurity — the root of every quality-classifier tree a
  * curation pipeline distills its heuristic gates into, trained
  * distributed and closed-form (no gradient loop, no learning rate, no
  * float drift — a batch perceptron on these integer magnitudes provably
  * oscillates, which is why the trainer here is the closed-form one).
  *
  * Exactness: weighted Gini is compared as score_ppb =
  * ⌊(n_L²−p_L²−q_L²)·10⁹ / n_L⌋ + ⌊(n_R²−p_R²−q_R²)·10⁹ / n_R⌋ — pure
  * integer, so argmin (ties to feature name, then threshold) is
  * bit-replayable by a SQL oracle. n²·10⁹ bounds the exact form to ~3M
  * labeled rows; beyond that, bin thresholds to quantiles and drop the
  * ppb scale (the candidate set shrinks, the arithmetic doesn't change).
  *
  * Scale shape: one unpivot (rows × features), one (feature, value)
  * count aggregation — map-side combinable — then cumulative sums over
  * windows PARTITIONED BY FEATURE (never a global single-partition
  * window; each feature's distinct-value list is the bounded thing).
  * Threshold candidates are the distinct observed values, the exact
  * CART baseline.
  */
object DecisionStump {

  /** @param ft       one row per example: label col `y` ∈ {0,1} plus the
    *                  integer feature columns
    * @param features feature column names to consider
    * @return one row per feature: its best split (feature, threshold —
    *         split is value ≤ threshold, score_ppb, acc_ppm of the
    *         majority-vote stump, rank among ALL candidate splits) */
  def train(ft: DataFrame, features: Seq[String]): DataFrame = {
    val stack = features.map(f => s"'$f', $f").mkString(", ")
    val lg = ft.select(col("y"),
      expr(s"stack(${features.size}, $stack) as (feature, value)"))
    val vc = lg.groupBy(col("feature"), col("value"))
      .agg(sum(col("y")).as("p"),
        (count(lit(1)) - sum(col("y"))).as("q"))
    val wOrd = Window.partitionBy(col("feature")).orderBy(col("value"))
    val wAll = Window.partitionBy(col("feature"))
    val sc = vc
      .withColumn("pl", sum(col("p")).over(wOrd))
      .withColumn("ql", sum(col("q")).over(wOrd))
      .withColumn("pt", sum(col("p")).over(wAll))
      .withColumn("qt", sum(col("q")).over(wAll))
      .withColumn("pr", col("pt") - col("pl"))
      .withColumn("qr", col("qt") - col("ql"))
      .withColumn("nl", col("pl") + col("ql"))
      .withColumn("nr", col("pr") + col("qr"))
      .filter(col("nr") > 0L) // the max value splits nothing off
    val gi = sc.select(col("feature"), col("value").as("threshold"),
      (expr("(nl*nl - pl*pl - ql*ql) * 1000000000L div nl") +
        expr("(nr*nr - pr*pr - qr*qr) * 1000000000L div nr")).as("score_ppb"),
      expr("(greatest(pl, ql) + greatest(pr, qr)) * 1000000L div (nl + nr)")
        .as("acc_ppm"))
    val wBest = Window.partitionBy(col("feature"))
      .orderBy(col("score_ppb"), col("threshold"))
    val wRank = Window.orderBy(col("score_ppb"), col("feature"),
      col("threshold"))
    // the global rank window runs over all candidate splits — bounded by
    // the distinct feature values, the already-reduced table
    gi.withColumn("rank", row_number().over(wRank).cast("long"))
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1).drop("rn")
  }
}
