package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus preparation operators: sequential token packing
  * (concat-and-chunk bin assignment) and deterministic hash-based
  * train/val/test splits. Both are pure column plans — no UDFs — and the
  * split hash is sha-based so external systems (and the DuckDB oracle)
  * reproduce the exact assignment.
  */
object TrainPrep {

  /** Assign each document to a fixed-capacity token bin by packing docs in
    * global `idCol` order (the standard pretraining concat-and-chunk
    * layout). A doc's bin is where its first token lands; `bin_offset` is
    * its start position inside that bin (docs longer than the remaining
    * space spill into the following bin(s), as concatenated streams do).
    *
    * Scale shape: the global running sum is two-phase. Approximate id
    * quantiles are collected ONCE and become literal range bounds, so the
    * id→range map is a pure expression (recomputation-stable, nothing
    * persisted); per-range token totals (one row per range) come back to
    * the driver and turn into range start offsets via a broadcast join;
    * a window *within* each range adds the local prefix. No single-task
    * global window, no |docs|-row funnel, and the result is the narrow
    * lazy assignment plan (id, n_tokens, bin, bin_offset) — the heavy doc
    * payloads never move. Bound skew only affects parallelism (capped at
    * `partitions` either way), never the output: any monotone id→range
    * map yields the same global layout.
    */
  /** Two-phase global running sum in `idCol` order — (id, n, start)
    * where start = Σ n of all strictly-earlier ids. The shared substrate
    * of [[sequentialPack]] and [[systematicPpsSample]]; see
    * [[sequentialPack]]'s scaladoc for the scale analysis. */
  private def globalCumsum(spark: SparkSession, df: DataFrame,
                           idCol: String, nCol: Column,
                           partitions: Int): DataFrame = {
    val base = df.select(col(idCol).cast("double").as("idd"),
      col(idCol).as("id"), nCol.cast("long").as("n"))
    val probs = (1 until partitions).map(_.toDouble / partitions).toArray
    val bounds =
      if (partitions <= 1) Array.empty[Double]
      else base.stat.approxQuantile("idd", probs, 0.001).distinct.sorted
    // monotone id -> range id from the literal bounds (0..len(bounds))
    val pid = size(filter(typedLit(bounds), b => b <= col("idd")))
    val withPid = base.withColumn("pid", pid)
    val perPart = withPid.groupBy(col("pid")).agg(sum(col("n")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = {
      var acc = 0L
      perPart.keys.toSeq.sorted.map { p =>
        val o = acc; acc += perPart(p); (p, o)
      }
    }
    import spark.implicits._
    val offDf = offsets.toDF("pid", "off")
    // explicit ROWS frame: the default RANGE frame would give tied ids a
    // shared cumulative sum
    val win = Window.partitionBy(col("pid")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withPid.join(broadcast(offDf), "pid")
      .withColumn("start", sum(col("n")).over(win) - col("n") + col("off"))
      .select(col("id"), col("n"), col("start"))
  }

  def sequentialPack(spark: SparkSession, df: DataFrame, idCol: String,
                     nTokensCol: Column, capacity: Long,
                     partitions: Int = 32): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    globalCumsum(spark, df, idCol, nTokensCol, partitions)
      .select(col("id").as(idCol), col("n").as("n_tokens"),
        floor(col("start") / capacity).as("bin"),
        pmod(col("start"), lit(capacity)).as("bin_offset"))
  }

  /** Packing-efficiency audit over a [[sequentialPack]] layout — one row:
    * (n_bins, n_docs, n_spanners, total_tokens, spilled_tokens, fill_ppm).
    * A spanner is a document that crosses its start bin's boundary
    * (bin_offset + n_tokens > capacity); spilled_tokens counts the
    * overflow portions — the attention-mask fragmentation a training run
    * pays unless it splits those documents. fill_ppm is total tokens over
    * n_bins × capacity (the last partial bin counts as a full bin — the
    * padding view).
    *
    * Pure aggregation over the pack assignment (one pass, one scalar
    * row); the pack itself already paid the two-phase cumsum. */
  def packAudit(packed: DataFrame, capacity: Long): DataFrame =
    packed.agg(
        (max(col("bin")) + 1L).as("n_bins"),
        count(lit(1)).as("n_docs"),
        sum(when(col("bin_offset") + col("n_tokens") > capacity, 1L)
          .otherwise(0L)).as("n_spanners"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(greatest(lit(0L),
          col("bin_offset") + col("n_tokens") - capacity))
          .as("spilled_tokens"))
      .select(col("n_bins"), col("n_docs"), col("n_spanners"),
        col("total_tokens"), col("spilled_tokens"),
        expr(s"total_tokens * 1000000L div (n_bins * ${capacity}L)")
          .as("fill_ppm"))

  /** Systematic probability-proportional-to-size (PPS) sampling — the
    * deterministic weighted sampler a corpus pipeline uses to draw docs
    * ∝ weight (quality score, token count): positions
    * p_j = ⌊j·W/k⌋ for j ∈ [0,k) walk the cumulative-weight axis with
    * one fixed stride, and a doc is picked once per position inside its
    * weight interval [start, start+w) — inclusion probability
    * min(1, k·w/W), exactly k picks in total, and a doc heavier than
    * W/k is (correctly) picked multiple times (`n_picks`). Classic
    * systematic sampling (Madow 1949); every decision is an integer
    * pure function of (id order, weights), so any engine replays it.
    *
    * Scale shape: one [[globalCumsum]] (two-phase, no global window)
    * plus a per-row integer predicate — no shuffle beyond the cumsum's,
    * no driver state beyond the range offsets. Caller guarantees
    * k·W < 2⁶³ (documents: k ≤ 10⁶ against W ≤ 10¹² tokens holds). */
  def systematicPpsSample(spark: SparkSession, df: DataFrame,
                          idCol: String, weightCol: Column, k: Int,
                          partitions: Int = 32): DataFrame = {
    require(k > 0, "k must be positive")
    val c = globalCumsum(spark, df, idCol, weightCol, partitions)
    // empty input / all-zero weights: no position can land anywhere —
    // return the empty frame (same guard convention as Hits/TfIdf)
    val w = Option(c.agg(sum(col("n"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    if (w <= 0L)
      return c.select(col("id").as(idCol), col("n").as("weight"),
        col("start").as("w_start"), lit(0L).as("n_picks"))
        .filter(lit(false))
    c.withColumn("jlo", expr(s"(start * $k + ${w - 1}L) div ${w}L"))
      .withColumn("jhi",
        expr(s"((start + n) * $k + ${w - 1}L) div ${w}L"))
      .withColumn("n_picks",
        greatest(lit(0L), least(lit(k.toLong), col("jhi")) - col("jlo")))
      .filter(col("n_picks") > 0L)
      .select(col("id").as(idCol), col("n").as("weight"),
        col("start").as("w_start"), col("n_picks"))
  }

  /** Deterministic, salt-keyed train/val/test assignment: bucket =
    * sha256(salt:id) mod 100 (sha so any engine reproduces it — xxhash64
    * would be faster but is Spark-private). trainPct + valPct must be
    * <= 100; the remainder is `test`. */
  def hashSplit(idCol: String, salt: String,
                trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100)
    val h = conv(substring(
      sha2(concat(lit(salt + ":"), col(idCol).cast("string")), 256), 1, 15),
      16, 10).cast("long") % 100
    when(h < trainPct, "train")
      .when(h < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Deterministic stratified (balanced) downsampling: keep each row of
    * stratum s with probability `targetPerStratum(s)`, decided by a
    * sha-keyed hash of the row id — reproducible across engines and runs,
    * exactly like [[hashSplit]]. The per-stratum fractions ride in on a
    * broadcast join (one row per stratum), so the plan is one scan + one
    * broadcast hash join + one filter; at 100 TB nothing shuffles.
    *
    * The canonical use is mixture balancing: compute per-stratum counts,
    * derive keep-fractions toward a target composition (e.g. equal-size
    * strata, or a published data-mixture table), then sample — the
    * "undersample the over-represented language / domain" step every
    * large-corpus pipeline runs before training. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: DataFrame, salt: String): DataFrame = {
    // fractions: (stratum, keep_ppm) — parts-per-million keeps the
    // threshold integral (float thresholds invite off-by-one-ulp skew)
    val h = conv(substring(
      sha2(concat(lit(salt + ":"), col(idCol).cast("string")), 256), 1, 15),
      16, 10).cast("long") % 1000000L
    df.join(broadcast(fractions),
        df(stratumCol) === fractions("stratum"))
      .filter(h < col("keep_ppm"))
      .drop("stratum").drop("keep_ppm") // output schema = df's columns
  }

  /** Benchmark-contamination check: for each corpus document, the number
    * of DISTINCT word n-grams it shares with the benchmark set, keeping
    * docs with >= `minShared` (the decontamination step every pretraining
    * pipeline runs against eval sets). Scale shape: the benchmark n-gram
    * set is small by definition (eval sets are thousands of docs), so it
    * is deduplicated and BROADCAST — the corpus side is one scan +
    * broadcast semi-join + per-doc count, no shuffle of corpus text. */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchTextCol: String,
                    n: Int = 3, minShared: Long = 1L): DataFrame = {
    val benchGrams = bench
      .select(explode(TextFunctions.wordNgrams(col(benchTextCol), n)).as("g"))
      .distinct()
    val docGrams = docs
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.wordNgrams(col(textCol), n)).as("g"))
      .distinct()
    docGrams.join(broadcast(benchGrams), "g")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Contamination SEVERITY grading: the longest benchmark n-gram each
    * corpus doc shares, over a ladder of gram sizes (default 3/6/12 words)
    * — the triage signal decontamination pipelines use to separate
    * incidental phrase overlap (short gram only) from verbatim benchmark
    * leakage (long gram). Sharing an n-gram implies sharing every
    * contained shorter gram, so `max_gram` is the natural severity level.
    * Scale shape = [[contamination]] per rung: the benchmark's distinct
    * gram set is BROADCAST; the corpus is scanned once per rung with no
    * text shuffle (at 100 TB fold the rungs into one pass by tagging
    * grams with their size before the broadcast join). */
  def contaminationSeverity(docs: DataFrame, idCol: String, textCol: String,
                            bench: DataFrame, benchTextCol: String,
                            sizes: Seq[Int] = Seq(3, 6, 12)): DataFrame =
    sizes.map { n =>
      contamination(docs, idCol, textCol, bench, benchTextCol, n, 1L)
        .select(col("doc_id"), lit(n.toLong).as("g_n"))
    }.reduce(_.unionByName(_))
      .groupBy(col("doc_id"))
      .agg(max(col("g_n")).as("max_gram"))

  /** Bloom-filter decontamination — the fixed-memory scale twin of
    * [[contamination]]: instead of broadcasting the benchmark's FULL
    * distinct n-gram set (which grows with the benchmark), broadcast a
    * Bloom bit-position table of at most `bits` rows. A corpus n-gram is
    * flagged iff all `hashes` of its sha-derived positions are set —
    * i.e. the standard Bloom membership test, possibly with false
    * positives (rate ≈ (1 − e^{−k·n/m})^k) and never false negatives, so
    * the flagged set is a SUPERSET of [[contamination]]'s (the safe
    * direction for decontamination: over-remove, never leak).
    *
    * Determinism/exactness: positions are sha256-derived
    * (hash j of gram g = sha60("j:g") mod bits), so the whole filter —
    * false positives included — is a pure function any engine replays
    * bit-for-bit; there is no approximate-oracle gap.
    *
    * Scale shape: the bit table is ≤ `bits` rows REGARDLESS of benchmark
    * size (broadcast); the corpus side explodes to (doc, gram, hash)
    * rows, joins the broadcast positions, and aggregates back — the
    * corpus never shuffles. */
  def contaminationBloom(docs: DataFrame, idCol: String, textCol: String,
                         bench: DataFrame, benchTextCol: String,
                         n: Int = 3, bits: Int = 16384, hashes: Int = 3,
                         minShared: Long = 1L): DataFrame = {
    def position(g: Column, j: Int): Column =
      pmod(Dedup.shaTokenHash60(concat(lit(s"$j:"), g)), lit(bits.toLong))
    def positions(g: Column): Column =
      array((0 until hashes).map(position(g, _)): _*)
    val bloom = bench
      .select(explode(TextFunctions.wordNgrams(col(benchTextCol), n)).as("g"))
      .distinct()
      .select(explode(positions(col("g"))).as("p")).distinct()
    val docGrams = docs
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.wordNgrams(col(textCol), n)).as("g"))
      .distinct()
    docGrams
      .select(col("doc_id"), col("g"), explode(positions(col("g"))).as("p"))
      .join(broadcast(bloom), "p")
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("hits"))
      .filter(col("hits") === hashes)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_flagged"))
      .filter(col("n_flagged") >= minShared)
  }

  /** Corpus-wide top-k n-grams by document frequency (distinct docs
    * containing the gram), deterministic tie-break by gram — the corpus
    * profiling / boilerplate-detection primitive. Two-phase: per-doc
    * distinct grams (map-side combined), global count, top-k window. */
  def topNgrams(docs: DataFrame, idCol: String, textCol: String,
                n: Int, k: Int): DataFrame = {
    val freq = docs
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.wordNgrams(col(textCol), n)).as("g"))
      .distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("n_docs"))
    // distributed top-k FIRST (TakeOrdered — per-partition heaps, no
    // global single-task window over every distinct gram); the rank
    // window then runs over k rows only
    val top = freq.orderBy(col("n_docs").desc, col("g")).limit(k)
    val w = Window.orderBy(col("n_docs").desc, col("g"))
    top.withColumn("rnk", row_number().over(w).cast("long"))
  }

  /** Deterministic fixed-SIZE per-stratum sample ("reservoir" semantics
    * without RNG state): the k rows of each stratum with the smallest
    * sha256(salt:id) — a uniform-at-random choice under the
    * random-oracle view of sha, reproducible across engines, runs, and
    * cluster sizes. Complements [[stratifiedSample]] (fixed FRACTION):
    * exact-count eval slices and per-domain audit samples want exactly-k.
    *
    * Scale shape: two-phase top-k. Phase 1 ranks within
    * (stratum, input partition) — the shuffle key carries the partition
    * id, so a hub stratum spreads over all tasks instead of funneling
    * into one (the skew trap of a naive per-stratum window); survivors
    * are <= k·partitions rows. Phase 2 re-ranks that small candidate set
    * per stratum. The final top-k depends only on the hash order, never
    * on the partitioning, so the result is deterministic even though the
    * phase-1 candidate sets are not. */
  def reservoirSample(df: DataFrame, idCol: String, stratumCol: String,
                      k: Int, salt: String): DataFrame = {
    require(k > 0, "k must be positive")
    val h = conv(substring(
      sha2(concat(lit(salt + ":"), col(idCol).cast("string")), 256), 1, 15),
      16, 10).cast("long")
    val hashed = df.withColumn("smp_h", h)
      .withColumn("smp_p", spark_partition_id())
    val w1 = Window.partitionBy(col(stratumCol), col("smp_p"))
      .orderBy(col("smp_h"), col(idCol))
    val cand = hashed.withColumn("smp_r1", row_number().over(w1))
      .filter(col("smp_r1") <= k)
    val w2 = Window.partitionBy(col(stratumCol))
      .orderBy(col("smp_h"), col(idCol))
    cand.withColumn("rnk", row_number().over(w2).cast("long"))
      .filter(col("rnk") <= k)
      .drop("smp_h", "smp_p", "smp_r1")
  }

  /** Per-stratum mixture statistics and balancing weights: for each
    * stratum, its row and token share plus the keep-fraction (ppm) that
    * would downsample every stratum to the smallest one's row count —
    * the input table for [[stratifiedSample]]. One aggregation plus a
    * scalar broadcast; exact integer/decimal arithmetic. */
  def mixtureStats(df: DataFrame, stratumCol: String,
                   nTokensCol: Column): DataFrame = {
    val agg = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_docs"), sum(nTokensCol).as("n_tokens"))
    val mn = agg.agg(min(col("n_docs")).as("min_docs"))
    agg.join(broadcast(mn))
      .select(col("stratum"), col("n_docs"), col("n_tokens"),
        // integer division (`div`): Column./ on longs is DOUBLE division,
        // whose floor can disagree with exact integer floor at the ulp
        expr("min_docs * 1000000L div n_docs").as("keep_ppm"))
  }

  /** Token-budget allocation across strata — integer water-filling with
    * one redistribution round: give every stratum an equal share of the
    * budget, let strata with less material than their share keep only
    * what they have, and split the freed remainder equally among the
    * still-unsatisfied ones. The "how many tokens do I take from each
    * source under a total budget" planning step that sits between
    * [[mixtureStats]] and [[stratifiedSample]] in a corpus build. All
    * arithmetic is `div`-exact, so the plan is hash-oracle replayable;
    * two fixed rounds keep it closed-form (the fixpoint version just
    * iterates the same two aggregates).
    *
    * Scale shape: one groupBy over the corpus for per-stratum totals,
    * then every remaining step runs on the strata table (tiny by
    * definition) via a single-row cross join — the corpus is scanned
    * once and never shuffled again.
    * @return (stratum, avail, alloc, fill_ppm) */
  def tokenBudget(df: DataFrame, stratumCol: String, nTokensCol: Column,
                  budgetNum: Long = 1L, budgetDen: Long = 2L): DataFrame = {
    val avail = df.groupBy(col(stratumCol).as("stratum"))
      .agg(sum(nTokensCol).as("avail"))
    val tot = avail.agg(sum(col("avail")).as("t"), count(lit(1)).as("k"))
      .select(expr(s"t * ${budgetNum}L div ${budgetDen}L").as("budget"),
        col("k"))
    val r1 = avail.join(broadcast(tot))
      .withColumn("fair", expr("budget div k"))
      .withColumn("a1", least(col("avail"), col("fair")))
    val stats = r1.agg(sum(col("a1")).as("used"),
      sum(when(col("avail") > col("fair"), 1L).otherwise(0L)).as("unsat"))
    r1.join(broadcast(stats))
      .withColumn("extra",
        when(col("unsat") > 0L,
          expr("(budget - used) div unsat")).otherwise(lit(0L)))
      .select(col("stratum"), col("avail"),
        when(col("avail") <= col("fair"), col("a1"))
          .otherwise(least(col("avail"), col("fair") + col("extra")))
          .as("alloc"))
      .withColumn("fill_ppm", expr("alloc * 1000000L div avail"))
  }

  /** Hashed n-gram domain-affinity scoring (the DSIR idea — Xie et al.
    * NeurIPS'23 "Data Selection for Language Models via Importance
    * Resampling" — in integer fixed point): featurize every document by
    * its word unigrams+bigrams hashed into `buckets` sha-derived
    * buckets, learn per-bucket rates from a TARGET slice vs the RAW
    * corpus (add-one smoothing, ppm), and score each document by the
    * summed per-gram rate difference — a linear domain classifier whose
    * positive scores mark target-like documents for up-sampling.
    *
    * Integer-exact by construction: bucket rates are smoothed integer
    * parts-per-billion (`div` — ppb, not ppm: the add-one smoothing
    * denominator is dominated by `buckets`, so ppm resolution (~244
    * per count at 4096 buckets) would truncate small-corpus rate
    * differences to zero), the doc score is a SUM of per-gram longs
    * (order-independent), so the oracle replays it bit-for-bit — no
    * log-likelihood floats to disagree at the ulp.
    *
    * Scale shape: both rate tables are <= `buckets` rows (broadcast —
    * independent of corpus size); the corpus explodes to gram rows,
    * joins the broadcast table, and aggregates back by doc — ONE
    * corpus-keyed shuffle, nothing quadratic. */
  def domainAffinity(docs: DataFrame, idCol: String, textCol: String,
                     isTarget: Column, buckets: Int = 4096): DataFrame = {
    def grams(t: Column): Column = concat(
      TextFunctions.wordNgrams(t, 1), TextFunctions.wordNgrams(t, 2))
    // persisted: the sha-hashed gram stream feeds BOTH the per-bucket
    // rate table and the final per-doc score join — without the cache
    // the explode + per-gram sha256 runs twice
    val g = docs
      .select(col(idCol).as("doc_id"), isTarget.as("is_target"),
        explode(grams(col(textCol))).as("g"))
      .withColumn("b", pmod(Dedup.shaTokenHash60(col("g")),
        lit(buckets.toLong)))
      .persist()
    // per-bucket gram counts for the target slice and the whole corpus,
    // densified over 0..buckets-1 so add-one smoothing covers unseen
    // buckets; totals folded in as literal scalars (two bounded jobs)
    val spark = docs.sparkSession
    val all = spark.range(buckets).select(col("id").as("b"))
      .join(g.groupBy(col("b"))
        .agg(count(lit(1)).as("rc0"),
          sum(col("is_target").cast("long")).as("tc0")), Seq("b"), "left")
      .select(col("b"), coalesce(col("rc0"), lit(0L)).as("rc"),
        coalesce(col("tc0"), lit(0L)).as("tc"))
    val tot = all.agg(sum(col("rc")), sum(col("tc"))).head()
    val (rTot, tTot) = (tot.getLong(0), tot.getLong(1))
    val rates = all.select(col("b"),
      expr(s"(tc + 1L) * 1000000000L div ${tTot + buckets}L").as("t_ppb"),
      expr(s"(rc + 1L) * 1000000000L div ${rTot + buckets}L").as("r_ppb"))
    // eager narrow result + drop the gram cache (the Dedup discipline)
    val out = g.join(broadcast(rates), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(col("t_ppb") - col("r_ppb")).as("score_ppb"))
      .localCheckpoint(eager = true)
    g.unpersist()
    out
  }

  /** Vocabulary-coverage / OOV-rate profiling: the top-`vocabSize`
    * corpus words (by total occurrences, ties lexicographic — a total
    * order, so the vocabulary boundary is deterministic) form the
    * vocabulary; per document, token count, OOV count and oov_ppm — the
    * fixed-vocab coverage check run before committing to a tokenizer.
    * Scale shape: the vocabulary is a distributed TakeOrdered broadcast
    * back (≤ vocabSize rows however big the corpus); the corpus shuffles
    * once to aggregate per doc. */
  def oovStats(docs: DataFrame, idCol: String, textCol: String,
               vocabSize: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("w"))
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(vocabSize)
      .select(col("w"), lit(1L).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm", expr("n_oov * 1000000L div n_tokens"))
  }

  /** Exact-percentile winsorization (outlier capping): clip an integer
    * value column at the exact loPct/hiPct percentiles (smallest value
    * whose cumulative count reaches ceil(p·n/100) — the q104/degree-
    * profile order statistic) and report the clipped value + which tail
    * each row hit. The outlier-control pass before length-weighted
    * sampling or packing: one extreme doc otherwise dominates token
    * budgets. Shape: one value-histogram aggregation, a window over the
    * DISTINCT values (bounded by the value cardinality, not |rows|),
    * two scalar thresholds folded back as literals via a broadcast-sized
    * cross join; the data pass is per-row arithmetic. */
  def winsorize(df: DataFrame, idCol: String, valueCol: Column,
                loPct: Int, hiPct: Int): DataFrame = {
    require(0 <= loPct && loPct < hiPct && hiPct <= 100)
    val base = df.select(col(idCol).as("id"), valueCol.cast("long").as("v"))
    val hist = base.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
      sum(col("c")).over(Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .persist()
    val n = base.count()
    if (n == 0)
      return base.select(col("id").as(idCol), col("v"),
        col("v").as("v_clipped"), lit(0L).as("tail")).filter(lit(false))
    def pct(q: Int): Long = cum.filter(col("cum") * 100 >= n * q)
      .agg(min(col("v"))).head().getLong(0)
    val (lo, hi) = (pct(loPct), pct(hiPct))
    cum.unpersist()
    base.select(col("id").as(idCol), col("v"),
      least(greatest(col("v"), lit(lo)), lit(hi)).as("v_clipped"),
      when(col("v") < lo, -1L).when(col("v") > hi, 1L).otherwise(0L)
        .as("tail"))
  }

  /** Padding-efficient length-bucketed batch assembly (the group-by-
    * length batching of finetuning pipelines): documents fall into
    * width-`bucketWidth` token-length buckets, each bucket packs
    * `batchTokens div bucket_cap` docs per batch in id order, and every
    * batch reports its padding waste (docs are padded to the bucket
    * cap). All integer; the per-bucket window is PARTITIONED (no global
    * single-task window), so batches assemble in parallel per bucket.
    * Docs with zero tokens are excluded (nothing to pack). */
  def lengthBucketBatches(df: DataFrame, idCol: String, nTokensCol: Column,
                          bucketWidth: Int = 128,
                          batchTokens: Int = 16384): DataFrame = {
    val t = df.select(col(idCol).as("doc_id"),
        nTokensCol.cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= 1)
      .withColumn("bucket_cap",
        (expr(s"(n_tokens - 1L) div ${bucketWidth}L") + 1)
          * bucketWidth)
      .withColumn("capacity",
        greatest(lit(1L), expr(s"${batchTokens}L div bucket_cap")))
    t.withColumn("rn", row_number().over(
        Window.partitionBy(col("bucket_cap")).orderBy(col("doc_id"))))
      .withColumn("batch_id", expr("(rn - 1L) div capacity"))
      .groupBy(col("bucket_cap"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .withColumn("padded_tokens",
        col("n_docs") * col("bucket_cap") - col("sum_tokens"))
  }

  /** Deterministic curriculum export order: docs are ranked by quality
    * bin (best bin first) with a sha-shuffled order inside each bin —
    * the "easy/clean first, shuffled within difficulty" layout a
    * curriculum-training data loader reads sequentially. The composite
    * sort key packs (bins−1−bin) into the 3 bits above the 60-bit sha
    * (so bins ≤ 8 keeps it in long range) and the global index is a
    * TWO-PHASE rank — quantile range bounds on the key, per-range
    * counts to offsets via one bounded collect, a window only inside
    * each range ordered by (key, id) — the same no-single-task-window
    * substrate as [[sequentialPack]], with the id tiebreak making the
    * rank unique even across sha collisions. */
  def curriculumOrder(spark: SparkSession, df: DataFrame, idCol: String,
                      scorePpmCol: Column, bins: Int = 8,
                      partitions: Int = 32): DataFrame = {
    require(bins >= 1 && bins <= 8, "bins must fit the 3-bit key prefix")
    val base = df.select(col(idCol).as("id"),
        scorePpmCol.cast("long").as("score_ppm"))
      .withColumn("bin", expr(s"score_ppm * $bins div 1000001L"))
      .withColumn("key",
        (lit((bins - 1).toLong) - col("bin")) * lit(1L << 60) +
          Dedup.shaTokenHash60(concat(lit("cur:"),
            col("id").cast("string"))))
    val probs = (1 until partitions).map(_.toDouble / partitions).toArray
    val withD = base.withColumn("keyd", col("key").cast("double"))
    val bounds =
      if (partitions <= 1) Array.empty[Double]
      else withD.stat.approxQuantile("keyd", probs, 0.001).distinct.sorted
    val pid = size(filter(typedLit(bounds), b => b <= col("keyd")))
    val withPid = withD.withColumn("pid", pid)
    val perPart = withPid.groupBy(col("pid")).agg(count(lit(1)).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    var acc = 0L
    val offsets = perPart.keys.toSeq.sorted.map { p =>
      val o = acc; acc += perPart(p); (p, o)
    }
    import spark.implicits._
    val offDf = offsets.toDF("pid", "off")
    val w = Window.partitionBy(col("pid")).orderBy(col("key"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withPid.join(broadcast(offDf), "pid")
      .withColumn("order_idx", count(lit(1)).over(w) - 1L + col("off"))
      .select(col("id").as(idCol), col("bin"), col("order_idx"))
  }

  /** Train/validation token-distribution drift — the split sanity check
    * run after [[hashSplit]]: if the two splits' unigram distributions
    * diverge, the split leaked structure (e.g. all docs of one source
    * landed in val) and downstream eval numbers are suspect.
    *
    * Returns the `topK` tokens by absolute ppm frequency gap,
    * (token, train_ppm, valid_ppm, delta_ppm, tv_ppm) with the global
    * total-variation distance (floor-ppm halved L1 over the shared
    * vocabulary) repeated on each row — the same
    * repeat-the-scalar-via-broadcast shape as the rich-club ledger.
    *
    * Scale: one corpus scan exploded to tokens, one (split, token)
    * count shuffle (vocabulary-bounded output), a broadcast of the two
    * per-split totals, a vocabulary-sized full-outer join, and a
    * distributed TakeOrdered for the topK — the corpus itself never
    * shuffles. Floor-ppm integers end-to-end. */
  def splitDrift(df: DataFrame, idCol: String, textCol: String,
                 salt: String = "s1", topK: Int = 12): DataFrame = {
    val toks = df
      .select(hashSplit(idCol, salt).as("split"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .filter(col("split") =!= "test")
    val counts = toks.groupBy(col("split"), col("token"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = true)
    val totals = counts.groupBy(col("split")).agg(sum(col("c")).as("t"))
    val ppm = counts.join(broadcast(totals), "split")
      .select(col("split"), col("token"),
        expr("c * 1000000L div t").as("ppm"))
    val tr = ppm.filter(col("split") === "train")
      .select(col("token"), col("ppm").as("train_ppm"))
    val va = ppm.filter(col("split") === "val")
      .select(col("token"), col("ppm").as("valid_ppm"))
    val joined = tr.join(va, Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("train_ppm"), lit(0L)).as("train_ppm"),
        coalesce(col("valid_ppm"), lit(0L)).as("valid_ppm"))
      .withColumn("delta_ppm",
        abs(col("train_ppm") - col("valid_ppm")))
      .localCheckpoint(eager = true)
    val tv = joined.agg(expr("sum(delta_ppm) div 2").as("tv_ppm"))
    joined.orderBy(col("delta_ppm").desc, col("token")).limit(topK)
      .crossJoin(broadcast(tv))
  }

  /** EXACT Lorenz-curve decile ledger + Gini coefficient of a
    * non-negative integer column (document length, tokens-per-source,
    * bytes-per-domain) — the concentration audit a curation run
    * publishes ("the longest 10% of docs hold X% of the characters").
    *
    * Scale shape: rows collapse to one row per DISTINCT VALUE first
    * (bounded vocabulary — lengths, not documents), so the global
    * ascending rank is exact WITHOUT any per-row global sort: a value
    * group of size c starting after cumulative count r0 occupies ranks
    * (r0, r0+c], its Σ-rank mass is an arithmetic series, and its
    * overlap with each decile's rank interval is plain integer
    * arithmetic — the window runs over the value histogram (then ×10
    * deciles), never over rows. Gini from the rank-weighted sum:
    * G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx), emitted as truncating-div ppm
    * (exact while 10⁶·Σ i·x_i fits int64 — petabyte runs promote the
    * three sums to decimal, same plan).
    * @return 10 rows: (decile, n_docs, mass, mass_ppm, cum_mass_ppm,
    *         gini_ppm) with decile d covering ascending ranks
    *         (d·n div 10, (d+1)·n div 10]. */
  def lorenzDeciles(df: DataFrame, valueCol: String): DataFrame = {
    val hist = df.groupBy(col(valueCol).cast("long").as("x"))
      .agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("r1", sum(col("c")).over(w))
      .withColumn("r0", col("r1") - col("c"))
      .localCheckpoint(eager = true)
    val tot = cum.agg(max(col("r1")).as("n"), sum(col("x") * col("c")).as("t"),
        // Σ i·x_i over the group: x·(c·r0 + c(c+1)/2)
        sum(col("x") * (col("c") * col("r0") +
          expr("c * (c + 1L) div 2"))).as("s"))
      .select(col("n"), col("t"),
        expr("(1000000L * (2L * s - (n + 1L) * t)) div (n * t)")
          .as("gini_ppm"))
    val deciles = df.sparkSession.range(0, 10)
      .select(col("id").as("decile"))
    val dec = cum.crossJoin(broadcast(tot.select(col("n"))))
      .crossJoin(broadcast(deciles))
      .select(col("decile"), col("x"), col("r0"), col("r1"), col("n"),
        // overlap of the group's rank interval (r0, r1] with the
        // decile's (d·n div 10, (d+1)·n div 10]
        (least(col("r1"), expr("(decile + 1L) * n div 10")) -
          greatest(col("r0"), expr("decile * n div 10"))).as("o"))
      .filter(col("o") > 0L)
      .groupBy(col("decile"))
      .agg(sum(col("o")).as("n_docs"), sum(col("o") * col("x")).as("mass"))
    val w2 = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec.crossJoin(broadcast(tot.select(col("t"), col("gini_ppm"))))
      .select(col("decile"), col("n_docs"), col("mass"),
        expr("(1000000L * mass) div t").as("mass_ppm"),
        sum(col("mass")).over(w2).as("cm"), col("t"), col("gini_ppm"))
      .select(col("decile"), col("n_docs"), col("mass"), col("mass_ppm"),
        expr("(1000000L * cm) div t").as("cum_mass_ppm"), col("gini_ppm"))
  }

  /** Heaps'-law vocabulary-growth ledger: reading the corpus in document
    * id order, how many DISTINCT word `n`-grams have been seen by the
    * end of each `bucket`-doc block — the "does more data still buy new
    * vocabulary" curve (q199's novelty is per-document; this is the
    * corpus-cumulative view). The n-gram order sets the vocabulary
    * granularity: unigrams saturate almost immediately on any corpus
    * with a closed word set, higher orders keep growing sublinearly —
    * the curve whose flattening is the diminishing-returns signal.
    *
    * Scale shape: one (gram → min doc id) aggregation over the gram
    * stream (map-side combined, vocabulary-bounded output — the same
    * first-occurrence move as q115/q199), bucket the first-occurrence
    * ids, and run the cumulative window over the ≤ n/bucket ledger rows
    * only. @return (bucket, first_doc, last_doc, new_tokens, cum_vocab)
    * for buckets that introduced ≥ 1 gram. */
  def heapsLedger(docs: DataFrame, idCol: String, textCol: String,
                  n: Int = 3, bucket: Int = 64): DataFrame = {
    val first = docs
      .select(col(idCol).as("id"),
        explode(TextFunctions.wordNgrams(col(textCol), n)).as("tok"))
      .groupBy(col("tok")).agg(min(col("id")).as("fid"))
      .groupBy(expr(s"fid div ${bucket}L").as("bucket"))
      .agg(count(lit(1)).as("new_tokens"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    first
      .select(col("bucket"), (col("bucket") * bucket).as("first_doc"),
        (col("bucket") * bucket + (bucket - 1)).as("last_doc"),
        col("new_tokens"))
      .withColumn("cum_vocab", sum(col("new_tokens")).over(w))
  }
}
