package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes in one pass, integer-exact — the classic
  * quality-classifier baseline (the CCNet/fastText wikiref filter shape)
  * trained and evaluated INSIDE the engine: per-token class counts are one
  * aggregation, the NB log-count-ratio weight of a token is a pure
  * function of those counts, and a document's score is one more
  * aggregation over its token instances. No iterations, no solver — the
  * whole classifier is two shuffles on a 100 TB corpus.
  *
  * Exactness (libm-free): floor-log2 via binary-string length — the q200
  * surprisal trick — turns the NB weight into the integer skeleton
  *
  *   w(t) = floor(log2((c1(t)+1) · (T0+V))) − floor(log2((c0(t)+1) · (T1+V)))
  *
  * (Laplace-smoothed count ratio, both sides scaled by the opposite
  * class's token total so the two floor-logs are comparable), and the
  * document score is Σ w(t) over token INSTANCES plus the prior bits
  * floor(log2 N1) − floor(log2 N0). Deterministic, bit-replayable in SQL.
  *
  * Scale shape: the weight table is vocabulary-sized, joined back to the
  * token stream by token key (a plain shuffle join — at web scale the
  * vocabulary is itself huge, so no broadcast); both aggregations are
  * map-side combinable; the label rule and features share one scan.
  */
object NaiveBayes {

  private def bits(c: org.apache.spark.sql.Column) =
    (length(bin(c)) - lit(1)).cast("long")

  /** Train on `labelCol` (0/1) over the token instances of `textCol`,
    * score every document with the learned weights, and return the
    * confusion matrix (y, pred, n) — self-evaluation on the training set,
    * the fit-sanity check a curation pipeline runs before exporting the
    * classifier. */
  def confusion(docs: DataFrame, idCol: String, textCol: String,
                labelCol: org.apache.spark.sql.Column): DataFrame = {
    val toks = docs.select(col(idCol).as("id"), labelCol.as("y"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .localCheckpoint(eager = true)

    // class totals: token instances T_c, doc counts N_c, shared vocab V
    val tot = toks.groupBy(col("y")).agg(
      count(lit(1)).as("t"), countDistinct(col("id")).as("n"))
    val v = toks.select(col("tok")).distinct().count()
    val row = tot.filter(col("y") === 1L)
      .crossJoin(tot.filter(col("y") === 0L)
        .select(col("t").as("t0"), col("n").as("n0")))
      .select(col("t").as("t1"), col("n").as("n1"), col("t0"), col("n0"))
      .head()
    val (t1, n1, t0, n0) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))

    val w = toks.groupBy(col("tok")).agg(
        sum(when(col("y") === 1L, 1L).otherwise(0L)).as("c1"),
        sum(when(col("y") === 0L, 1L).otherwise(0L)).as("c0"))
      .select(col("tok"),
        (bits((col("c1") + 1L) * lit(t0 + v)) -
          bits((col("c0") + 1L) * lit(t1 + v))).as("w"))

    val prior = java.lang.Long.toBinaryString(n1).length -
      java.lang.Long.toBinaryString(n0).length
    toks.join(w, "tok")
      .groupBy(col("id"), col("y"))
      .agg((sum(col("w")) + lit(prior.toLong)).as("score"))
      .groupBy(col("y"), (col("score") > 0L).cast("long").as("pred"))
      .agg(count(lit(1)).as("n"))
  }
}
