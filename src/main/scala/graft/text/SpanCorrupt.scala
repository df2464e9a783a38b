package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** T5-style span corruption (Raffel et al. JMLR'20 §3.1.4): deterministic
  * denoising pairs built in-engine — sha-selected span starts mask runs of
  * `spanLen` tokens; the corrupted input keeps "_" at masked positions,
  * the target is the masked tokens in order. The seq2seq pretraining
  * corpus is thus a pure function of the raw corpus: no RNG state to
  * ship, any worker (or a SQL oracle) regenerates the same pairs.
  *
  * Start positions are chosen where sha60("sc:" id ":" pos) % 100 <
  * startPct and pos + spanLen <= n; overlapping spans union. ~spanLen ×
  * startPct% of tokens mask (T5's 15% at spanLen 3, startPct 5 — here
  * startPct 8 for denser small-corpus evidence).
  *
  * Scale shape: one posexplode, one sha predicate per token, one per-doc
  * window with a spanLen-bounded rows frame (masked ⇔ a span starts
  * within the last spanLen positions — no self-join, no full-stream
  * window), one ordered re-aggregation per doc — all map-side combinable;
  * no driver state.
  */
object SpanCorrupt {

  def pairs(docs: DataFrame, idCol: String, textCol: String,
            spanLen: Int = 3, startPct: Int = 8): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
        TextFunctions.tokenCount(col(textCol)).as("n"),
        posexplode(TextFunctions.tokens(col(textCol))))
      .select(col("id"), col("n"), col("pos").cast("long").as("pos"),
        col("col").as("tok"))
    val flagged = toks.withColumn("s",
      (col("pos") + spanLen <= col("n") &&
        pmod(Dedup.shaTokenHash60(concat(lit("sc:"),
          col("id").cast("string"), lit(":"), col("pos").cast("string"))),
          lit(100L)) < startPct).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(-(spanLen - 1), 0)
    val tagged = flagged.withColumn("m", max(col("s")).over(w))
    tagged.groupBy(col("id"))
      .agg(
        max(col("pos") + 1L).as("n_tokens"),
        sum(col("m")).as("n_masked"),
        array_sort(collect_list(struct(col("pos"),
          when(col("m") === 1L, lit("_")).otherwise(col("tok")).as("t"))))
          .as("cs"),
        array_sort(collect_list(when(col("m") === 1L,
          struct(col("pos"), col("tok").as("t"))))).as("ts"))
      .select(col("id").as("doc_id"), col("n_tokens"), col("n_masked"),
        array_join(transform(col("cs"), e => e("t")), " ")
          .as("corrupted"),
        array_join(transform(col("ts"), e => e("t")), " ").as("target"))
  }
}
