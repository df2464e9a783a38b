package graft.text

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding merge learning (Sennrich et al. 2016, ACL) — the
  * tokenizer-TRAINING primitive of a pretraining-data pipeline (q34 is
  * the inference side: tokenize with a fixed rule). Classic BPE:
  * vocabulary of (word, freq), each word a symbol sequence (initially
  * its characters); each round counts every adjacent symbol pair
  * weighted by word frequency, picks the most frequent pair (ties:
  * lexicographically smallest), and merges its leftmost
  * non-overlapping occurrences into one symbol.
  *
  * Everything is integer counts and a deterministic argmax, so a SQL
  * oracle replays the learned merge table bit-for-bit (the merge step
  * replays in DuckDB as a delimiter-wrapped `replace`, whose
  * consume-and-continue semantics equal the leftmost-non-overlapping
  * fold here — the wrapping `|x|` markers prevent sub-symbol matches).
  *
  * Scale shape: pair counting and merging run over the DISTINCT-word
  * vocabulary (zipf-bounded, orders of magnitude smaller than the
  * corpus), so after the one corpus-sized word-count shuffle each round
  * is a vocab-sized aggregation plus a per-row array fold; the argmax
  * is a 1-row collect. Deviations from the paper, documented: no
  * end-of-word marker, alphabet restricted to [a-z]+ words.
  */
object BpeTrain {

  /** Learn the first `rounds` BPE merges from `docs(textCol)`.
    * Returns one row per round: (round, merge_left, merge_right,
    * pair_count), in round order. */
  def learnMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame =
    train(docs, textCol, rounds)._1

  /** Tokenize with the first `rounds` learned merges (the inference side
    * of the trained tokenizer — q34 tokenizes with a FIXED rule; this
    * closes the train→apply loop): per document, its [a-z]+ word count
    * and total symbol count after applying the merges. The merge fold
    * runs once over the DISTINCT-word vocabulary; documents then join
    * the (word → n_syms) map — the corpus itself never re-folds. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             rounds: Int): DataFrame = {
    val (_, vocab) = train(docs, textCol, rounds)
    val toks = vocab
      .select(col("word"), size(col("syms")).cast("long").as("ntok"))
    docs
      .select(col(idCol).as("doc_id"), explode(expr(
        s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).as("word"))
      .join(toks, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("ntok")).as("n_tokens"))
  }

  /** Shared trainer: (merge table, final vocabulary (word, syms, freq)).
    * The vocabulary result is only valid until the next action on the
    * returned frame completes — it is consumed eagerly by both callers. */
  private def train(docs: DataFrame, textCol: String,
                    rounds: Int): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    val words = docs
      .select(explode(
        expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("syms", expr("regexp_extract_all(word, '.', 0)"))
      .select(col("word"), col("syms"), col("freq"))
      .persist()
    try {
      var cur = words
      val merges = Seq.newBuilder[Row]
      var r = 1
      var exhausted = false
      while (r <= rounds && !exhausted) {
        val top = cur
          .filter(size(col("syms")) >= 2)
          .select(explode(expr(
            """transform(sequence(0, size(syms) - 2),
              |  i -> struct(element_at(syms, i + 1) AS l,
              |              element_at(syms, i + 2) AS r))""".stripMargin))
            .as("p"), col("freq"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val (l, rr, cnt) =
            (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += Row(r, l, rr, cnt)
          // leftmost non-overlapping merge: fold left-to-right, fusing x
          // into the accumulator's last symbol when (last, x) = (l, r);
          // the fused symbol l+r is strictly longer than l, so it can
          // never immediately re-match as a new left — no flag needed
          cur = cur.withColumn("syms", expr(
            s"""aggregate(syms, cast(array() as array<string>),
               |  (acc, x) -> IF(size(acc) > 0
               |                 AND element_at(acc, -1) = '$l' AND x = '$rr',
               |    concat(slice(acc, 1, size(acc) - 1), array('${l + rr}')),
               |    concat(acc, array(x))))""".stripMargin))
          r += 1
        }
      }
      val schema = StructType(Seq(
        StructField("round", IntegerType, nullable = false),
        StructField("merge_left", StringType, nullable = false),
        StructField("merge_right", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false)))
      // <= rounds driver rows — bounded like the argmax collects (A3)
      val mergeTable = spark.createDataFrame(
        spark.sparkContext.parallelize(merges.result(), 1), schema)
      // vocab materialized before the cache under it is released
      (mergeTable, cur.localCheckpoint(eager = true))
    } finally words.unpersist()
  }
}
