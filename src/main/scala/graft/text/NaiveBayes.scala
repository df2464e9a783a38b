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

  /** Train on `labelCol` (0/1) over the token instances of `textCol` and
    * return every document's integer NB score: (id, y, score). The
    * shared trunk of [[confusion]] and the gains ledger. */
  def scores(docs: DataFrame, idCol: String, textCol: String,
             labelCol: org.apache.spark.sql.Column): DataFrame = {
    // per-(doc, token) instance counts instead of the raw instance
    // stream: every downstream aggregation/join consumes k-weighted
    // rows — identical integers (sums of k == instance counts), ~25-30%
    // fewer rows through the checkpoint, the weight join and the score
    // aggregation (guide §2.3: aggregate before you shuffle)
    val toks = docs.select(col(idCol).as("id"), labelCol.as("y"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col("id"), col("y"), col("tok"))
      .agg(count(lit(1)).as("k"))
      .localCheckpoint(eager = true)

    // class totals: token instances T_c, doc counts N_c, shared vocab V
    val tot = toks.groupBy(col("y")).agg(
      sum(col("k")).as("t"), countDistinct(col("id")).as("n"))
    val v = toks.select(col("tok")).distinct().count()
    // headOption-guarded scalar pull (ADVICE r5): a label rule that
    // yields a single class at some scale factor makes the cross join
    // empty — return an empty score table (schema intact) instead of
    // crashing; the SQL oracle degrades the same way
    val rowOpt = tot.filter(col("y") === 1L)
      .crossJoin(tot.filter(col("y") === 0L)
        .select(col("t").as("t0"), col("n").as("n0")))
      .select(col("t").as("t1"), col("n").as("n1"), col("t0"), col("n0"))
      .collect().headOption
    if (rowOpt.isEmpty)
      return toks.select(col("id"), col("y"), col("k").as("score"))
        .limit(0)
    val row = rowOpt.get
    val (t1, n1, t0, n0) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))

    val w = toks.groupBy(col("tok")).agg(
        sum(when(col("y") === 1L, col("k")).otherwise(0L)).as("c1"),
        sum(when(col("y") === 0L, col("k")).otherwise(0L)).as("c0"))
      .select(col("tok"),
        (bits((col("c1") + 1L) * lit(t0 + v)) -
          bits((col("c0") + 1L) * lit(t1 + v))).as("w"))

    val prior = java.lang.Long.toBinaryString(n1).length -
      java.lang.Long.toBinaryString(n0).length
    toks.join(w, "tok")
      .groupBy(col("id"), col("y"))
      .agg((sum(col("k") * col("w")) + lit(prior.toLong)).as("score"))
  }

  /** Train on `labelCol` (0/1) over the token instances of `textCol`,
    * score every document with the learned weights, and return the
    * confusion matrix (y, pred, n) — self-evaluation on the training set,
    * the fit-sanity check a curation pipeline runs before exporting the
    * classifier. */
  def confusion(docs: DataFrame, idCol: String, textCol: String,
                labelCol: org.apache.spark.sql.Column): DataFrame =
    scores(docs, idCol, textCol, labelCol)
      .groupBy(col("y"), (col("score") > 0L).cast("long").as("pred"))
      .agg(count(lit(1)).as("n"))

  /** Gains/lift ledger of the NB score against its own labels — the
    * ranking-quality view a curation pipeline reads before picking a
    * score threshold ("the top score band captures X ppm of the
    * positives at Y ppm precision").
    *
    * One row per DISTINCT SCORE VALUE, descending:
    * (score, n, pos, cum_n, cum_pos, rate_ppm, capture_ppm). The integer
    * NB score is a sum of floor-log2 bit weights, so its value range is
    * a few hundred at any corpus size — the ledger aggregates the
    * per-document scores down to that tiny histogram FIRST (map-side
    * combinable) and only then runs the cumulative window, over
    * hundreds of rows, never over documents. An exact per-document
    * decile (ntile) would need a global single-task sort of every doc;
    * banding by score value is the scale-correct gains curve. */
  def gains(docs: DataFrame, idCol: String, textCol: String,
            labelCol: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = scores(docs, idCol, textCol, labelCol)
      .groupBy(col("score"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("y") === 1L, 1L).otherwise(0L)).as("pos"))
      .localCheckpoint(eager = true)
    val w = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // sum over an empty histogram is NULL — Option-guard like the other
    // empty-input scalar pulls (conductanceWeighted, systematicPpsSample)
    val totalPos = Option(hist.agg(sum(col("pos"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    hist.withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("cum_pos", sum(col("pos")).over(w))
      .select(col("score"), col("n"), col("pos"), col("cum_n"),
        col("cum_pos"),
        expr("pos * 1000000L div n").as("rate_ppm"),
        expr(s"cum_pos * 1000000L div ${math.max(totalPos, 1L)}L")
          .as("capture_ppm"))
  }

  /** Reliability (calibration) ledger of the NB score against its own
    * labels — "when the classifier is this confident, how often is it
    * right". The integer bit-score implies a confidence: score s is a
    * log2-odds estimate, so P(pred correct) ≈ 2^|s| / (2^|s| + 1); a
    * well-calibrated band has empirical accuracy near that. One row per
    * DISTINCT SCORE VALUE (the same tiny-histogram discipline as
    * [[gains]] — no per-document window anywhere):
    * (score, n, n_correct, conf_ppm, acc_ppm, gap_ppm, ece_ppm) with
    * conf in integer ppm via a 2^min(|s|,20) shift (saturated: beyond 20
    * bits conf_ppm is 1000000 − sub-ppm), acc the band's hit rate, and
    * ece_ppm the n-weighted mean |conf − acc| over bands (expected
    * calibration error, constant per row) — everything truncating
    * integer `div`, bit-replayable by the SQL oracle. */
  def calibration(docs: DataFrame, idCol: String, textCol: String,
                  labelCol: org.apache.spark.sql.Column): DataFrame = {
    val p2 = "shiftleft(1L, cast(least(abs(score), 20) as int))"
    val led = scores(docs, idCol, textCol, labelCol)
      .groupBy(col("score"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("y") === (col("score") > 0L).cast("long"), 1L)
          .otherwise(0L)).as("n_correct"))
      .select(col("score"), col("n"), col("n_correct"),
        expr(s"(1000000L * $p2) div ($p2 + 1L)").as("conf_ppm"),
        expr("(1000000L * n_correct) div n").as("acc_ppm"))
      .withColumn("gap_ppm", abs(col("conf_ppm") - col("acc_ppm")))
      .localCheckpoint(eager = true)
    val ece = led
      .agg(sum(col("n")).as("nn"), sum(col("n") * col("gap_ppm")).as("sg"))
      .select(expr("sg div nn").as("ece_ppm"))
    led.crossJoin(ece)
  }

  /** Leave-one-source-out (LOO) data valuation of the NB classifier —
    * "which corpus source is load-bearing for the model": for every
    * source s, train the classifier on the corpus MINUS s and report the
    * confusion matrix on the remaining docs. The influence-function /
    * Shapley-lite question every mixing decision asks before dropping or
    * down-weighting a source, answered exactly because multinomial-NB
    * sufficient statistics are ADDITIVE: the LOO model for s is the
    * global count tables minus s's count tables — no per-source
    * retraining pass, the whole family of |S| models falls out of ONE
    * extra (token, source) aggregation.
    *
    * Exactness: identical integer bit arithmetic to [[scores]] (floor-
    * log2 via bin-length), with per-source totals subtracted inside the
    * logs and the LOO vocabulary V_s = V − |tokens exclusive to s|
    * (Laplace denominators see only surviving vocabulary). LOO priors
    * get +1 smoothing (a source may own an entire class; the global
    * model in [[confusion]] keeps its raw priors).
    *
    * Scale shape: token instances shuffle twice (global counts,
    * per-source counts); the LOO weight table is vocabulary × |sources|
    * rows and the scoring join replicates each token instance |sources|
    * times — bounded by the source count, which at any corpus scale is
    * the mixing-ledger grain (dozens), never a per-doc dimension.
    * Output: (held_out, y, pred, n) — one confusion per held-out source
    * over the docs that survive the holdout. */
  def looSourceValue(docs: DataFrame, idCol: String, textCol: String,
                     srcCol: String,
                     labelCol: org.apache.spark.sql.Column): DataFrame = {
    // per-(doc, token) counts — the [[scores]] compression, identical
    // integers with k-weighted sums
    val toks = docs.select(col(idCol).as("id"), col(srcCol).as("dsrc"),
        labelCol.as("y"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col("id"), col("dsrc"), col("y"), col("tok"))
      .agg(count(lit(1)).as("k"))
      .localCheckpoint(eager = true)

    val tot = toks.groupBy(col("y")).agg(
      sum(col("k")).as("t"), countDistinct(col("id")).as("n"))
    val v = toks.select(col("tok")).distinct().count()
    // headOption-guarded like [[scores]] (ADVICE r5): a one-class
    // corpus yields an empty confusion ledger, not a crash
    val trowOpt = tot.filter(col("y") === 1L)
      .crossJoin(tot.filter(col("y") === 0L)
        .select(col("t").as("t0"), col("n").as("n0")))
      .select(col("t").as("t1"), col("n").as("n1"), col("t0"), col("n0"))
      .collect().headOption
    if (trowOpt.isEmpty)
      return toks.select(col("dsrc").as("held_out"), col("y"),
        col("k").as("pred"), col("k").as("n")).limit(0)
    val trow = trowOpt.get
    val (t1, n1, t0, n0) =
      (trow.getLong(0), trow.getLong(1), trow.getLong(2), trow.getLong(3))

    // per-source class totals + exclusive-vocabulary count → the LOO
    // scalar table (|sources| rows, broadcast everywhere below)
    val srcTot = toks.groupBy(col("dsrc").as("hsrc")).agg(
      sum(when(col("y") === 1L, col("k")).otherwise(0L)).as("t1s"),
      sum(when(col("y") === 0L, col("k")).otherwise(0L)).as("t0s"),
      countDistinct(when(col("y") === 1L, col("id"))).as("n1s"),
      countDistinct(when(col("y") === 0L, col("id"))).as("n0s"))
    val pres = toks.select(col("tok"), col("dsrc")).distinct()
    val excl = pres.join(
        pres.groupBy(col("tok")).agg(count(lit(1)).as("ns")), "tok")
      .filter(col("ns") === 1L)
      .groupBy(col("dsrc").as("hsrc")).agg(count(lit(1)).as("vx"))
    val scal = srcTot.join(excl, Seq("hsrc"), "left")
      .select(col("hsrc"), col("t1s"), col("t0s"), col("n1s"), col("n0s"),
        (lit(v) - coalesce(col("vx"), lit(0L))).as("vloo"))

    val cnt = toks.groupBy(col("tok")).agg(
      sum(when(col("y") === 1L, col("k")).otherwise(0L)).as("c1"),
      sum(when(col("y") === 0L, col("k")).otherwise(0L)).as("c0"))
    val cntS = toks.groupBy(col("tok"), col("dsrc").as("hsrc")).agg(
      sum(when(col("y") === 1L, col("k")).otherwise(0L)).as("c1s"),
      sum(when(col("y") === 0L, col("k")).otherwise(0L)).as("c0s"))

    // LOO weight table: vocabulary × sources; a (tok, source) pair absent
    // from cntS subtracts nothing (the token never occurs in that source)
    val w = cnt.crossJoin(broadcast(scal))
      .join(cntS, Seq("tok", "hsrc"), "left")
      .select(col("tok"), col("hsrc"),
        (bits((col("c1") - coalesce(col("c1s"), lit(0L)) + 1L) *
            (lit(t0) - col("t0s") + col("vloo"))) -
          bits((col("c0") - coalesce(col("c0s"), lit(0L)) + 1L) *
            (lit(t1) - col("t1s") + col("vloo")))).as("w"),
        (bits(lit(n1) - col("n1s") + 1L) -
          bits(lit(n0) - col("n0s") + 1L)).as("prior"))

    toks.join(w, "tok")
      .filter(col("dsrc") =!= col("hsrc")) // held-out docs leave the eval
      .groupBy(col("id"), col("y"), col("hsrc"), col("prior"))
      .agg((sum(col("k") * col("w")) + col("prior")).as("score"))
      .groupBy(col("hsrc").as("held_out"), col("y"),
        (col("score") > 0L).cast("long").as("pred"))
      .agg(count(lit(1)).as("n"))
  }
}
