package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort / user-lifecycle analytics over the events stream — the
  * product-side ledgers (retention triangle, conversion latency, RFM
  * segmentation) a pipeline publishes next to the funnel census (q128)
  * and sessionization (q53). All-integer arithmetic (epoch-day `div`,
  * floor-ppm shares, micro-unit money via the q53 `round(v·10⁶)`
  * convention), so every ledger hash-matches its SQL oracle.
  *
  * Scale discipline: per-user aggregations are single map-side-combined
  * shuffles on the user key; every cumulative / rank window runs over a
  * BOUNDED ledger (days × offsets, hour buckets, value bands) — never
  * over users or events.
  */
object Cohorts {

  private def dayCol(tsCol: String) =
    expr(s"unix_micros(CAST($tsCol AS TIMESTAMP)) div 86400000000L")

  /** Retention triangle: users are cohorted by their FIRST active day;
    * cell (cohort_day, day_offset) counts the cohort's users active
    * exactly `day_offset` days after joining, with the floor-ppm share
    * of the cohort. One (user, day) distinct shuffle, a per-user min,
    * and a co-keyed join back — the ledger is |days|² cells at most.
    * @return (cohort_day, day_offset, n_active, cohort_n, retention_ppm) */
  def retention(events: DataFrame, userCol: String,
                tsCol: String): DataFrame = {
    val act = events
      .select(col(userCol).as("u"), dayCol(tsCol).as("d"))
      .distinct()
      .persist()
    val cohort = act.groupBy(col("u")).agg(min(col("d")).as("c"))
    val sizes = cohort.groupBy(col("c").as("cohort_day"))
      .agg(count(lit(1)).as("cohort_n"))
    val out = act.join(cohort, "u")
      .groupBy(col("c").as("cohort_day"),
        (col("d") - col("c")).as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, "cohort_day")
      .withColumn("retention_ppm",
        expr("(1000000L * n_active) div cohort_n"))
      .localCheckpoint(eager = true)
    act.unpersist()
    out
  }

  /** Conversion-latency ledger: per user, the delay from the FIRST
    * `fromType` event to the first `toType` event AFTER it, bucketed to
    * hours — (bucket_h, n_users, cum_users) plus the exact median
    * BUCKET as a constant column (the rank-(n+1)/2 bucket from the
    * cumulative histogram; the histogram is hours-wide, so the median
    * window never touches users). Unconverted users simply drop out —
    * their share is the funnel census's (q128) job. */
  def convertLatency(events: DataFrame, userCol: String, typeCol: String,
                     tsCol: String, fromType: String, toType: String)
      : DataFrame = {
    val tus = expr(s"unix_micros(CAST($tsCol AS TIMESTAMP))")
    val firstFrom = events.filter(col(typeCol) === fromType)
      .groupBy(col(userCol).as("u")).agg(min(tus).as("f"))
    val delays = events.filter(col(typeCol) === toType)
      .select(col(userCol).as("u"), tus.as("t"))
      .join(firstFrom, "u")
      .filter(col("t") > col("f"))
      .groupBy(col("u")).agg(min(col("t") - col("f")).as("delay"))
    val hist = delays
      .groupBy(expr("delay div 3600000000L").as("bucket_h"))
      .agg(count(lit(1)).as("n_users"))
      .localCheckpoint(eager = true)
    val w = Window.orderBy(col("bucket_h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum_users", sum(col("n_users")).over(w))
      .localCheckpoint(eager = true)
    val med = cum
      .crossJoin(broadcast(cum.agg(max(col("cum_users")).as("n"))))
      .filter(col("cum_users") >= expr("(n + 1L) div 2"))
      .agg(min(col("bucket_h")).as("median_bucket_h"))
    cum.crossJoin(broadcast(med))
  }

  /** RFM segmentation: per user, Recency (days since the user's last
    * event, from the corpus's last day), Frequency (event count) and
    * Monetary (micro-unit `round(value·10⁶)` sum — the q53 rounding
    * convention both engines share), each cut into terciles, and the
    * 27-cell segment census. Tercile boundaries come from the VALUE
    * HISTOGRAM cumulative counts (tercile of a value group =
    * `3·r0 div n` of its first member, capped at 2) — recency is
    * days-bounded, frequency count-bounded, and monetary is banded to
    * whole units first, so no rank window ever runs over users.
    * @return (r_t, f_t, m_t, n_users) for non-empty segments */
  def rfm(events: DataFrame, userCol: String, tsCol: String,
          valueCol: String): DataFrame = {
    val per = events
      .groupBy(col(userCol).as("u"))
      .agg(max(dayCol(tsCol)).as("lastd"), count(lit(1)).as("freq"),
        sum(expr(s"CAST(round($valueCol * 1000000, 0) AS BIGINT)"))
          .as("mon"))
      .localCheckpoint(eager = true)
    val maxDay = per.agg(max(col("lastd")).as("maxd"))
    val feats = per.crossJoin(broadcast(maxDay))
      .select(col("u"), (col("maxd") - col("lastd")).as("rec"),
        col("freq"), expr("mon div 1000000L").as("mband"))
      .localCheckpoint(eager = true)

    // tercile id per distinct metric value: 3*(cum count before the
    // value group) div n, capped at 2 — the whole group shares its
    // first member's tercile, deterministically
    def terciles(metric: String): DataFrame = {
      val hist = feats.groupBy(col(metric).as("v"))
        .agg(count(lit(1)).as("c"))
      val w = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("r1", sum(col("c")).over(w))
        .withColumn("r0", col("r1") - col("c"))
      cum.crossJoin(broadcast(cum.agg(max(col("r1")).as("n"))))
        .select(col("v").as(metric),
          least(lit(2L), expr("(3L * r0) div n")).as(s"${metric}_t"))
    }

    feats
      .join(broadcast(terciles("rec")), "rec")
      .join(broadcast(terciles("freq")), "freq")
      .join(broadcast(terciles("mband")), "mband")
      .groupBy(col("rec_t").as("r_t"), col("freq_t").as("f_t"),
        col("mband_t").as("m_t"))
      .agg(count(lit(1)).as("n_users"))
  }
}
