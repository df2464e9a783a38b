package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event stream — the classic product /
  * session question: how far through the step sequence (e.g.
  * view → click → purchase) did each user get, where step i+1 counts
  * only if it happens STRICTLY AFTER the user's completing timestamp of
  * step i (the earliest-completion semantics: step i is completed at the
  * MINIMUM qualifying time, which maximizes what can still follow — the
  * standard unordered-funnel-free interpretation).
  *
  * Scale shape: one pass filters the event table to funnel steps only,
  * then per step one min-aggregation keyed by user and one user-keyed
  * join against the previous stage — |steps| joins over |users|-sized
  * state, never a window over raw events and never a per-user event
  * sort. Timestamps are epoch microseconds (integer-exact).
  */
object Funnel {

  /** Per-user funnel outcome: (user, stage, t_final) where `stage` is
    * the number of completed steps and `t_final` the completion time of
    * the last completed step (null at stage 0). Users with no events of
    * any funnel type are absent (they are not in the funnel's universe). */
  def stages(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = events.select(col(userCol).as("user"), col(typeCol).as("g"),
      unix_micros(col(tsCol).cast("timestamp")).as("t"))
      .filter(col("g").isin(steps.map(s => s: Any): _*))
    val universe = ev.select(col("user")).distinct()
    // stage tables: tK = per-user earliest completion time of step K
    var reached: Seq[DataFrame] = Seq(
      ev.filter(col("g") === steps.head)
        .groupBy(col("user")).agg(min(col("t")).as("t1")))
    for (i <- 1 until steps.size) {
      val prev = reached.last.select(col("user"), col(s"t$i").as("tp"))
      val next = ev.filter(col("g") === steps(i))
        .join(prev, "user")
        .filter(col("t") > col("tp"))
        .groupBy(col("user")).agg(min(col("t")).as(s"t${i + 1}"))
      reached = reached :+ next
    }
    val joined = reached.zipWithIndex.foldLeft(universe) {
      case (acc, (df, _)) => acc.join(df, Seq("user"), "left")
    }
    val stageCols = (steps.size to 1 by -1).map(i =>
      when(col(s"t$i").isNotNull,
        struct(lit(i.toLong).as("stage"), col(s"t$i").as("t_final"))))
    joined
      .withColumn("res", coalesce(stageCols :+
        struct(lit(0L).as("stage"),
          lit(null).cast("long").as("t_final")): _*))
      .select(col("user").as("user_id"), col("res.stage").as("stage"),
        col("res.t_final").as("t_final"))
  }

  /** Funnel census: users reaching each stage (including stage 0). */
  def census(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame =
    stages(events, userCol, typeCol, tsCol, steps)
      .groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
}
