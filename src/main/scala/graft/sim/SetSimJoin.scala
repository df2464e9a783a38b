package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact all-pairs set-similarity join with PREFIX FILTERING (the
  * AllPairs/PPJoin family — Bayardo et al. WWW'07, Xiao et al. WWW'08):
  * find every pair of sets with Jaccard ≥ t WITHOUT the quadratic
  * all-pairs comparison and WITHOUT the approximation of MinHash-LSH
  * ([[graft.text.Dedup.minHashLsh]] — that stays the near-dup scale path;
  * this is the EXACT path when the threshold is a hard contract).
  *
  * Prefix-filter theorem: order each set's tokens canonically (here by
  * (global frequency asc, token) — rarest first); two sets A, B with
  * J(A,B) ≥ t must overlap in ≥ ⌈t·|A|⌉ tokens, so A missing ALL of its
  * first |A| − ⌈t·|A|⌉ + 1 tokens of B's content is impossible — every
  * qualifying pair shares at least one PREFIX token. Candidates are
  * generated only from prefix-token collisions, then verified exactly.
  *
  * Scale shape: token frequencies are one map-side-combined aggregation;
  * prefix ranking is a per-set window (vertex-partitioned, never global);
  * the candidate join is keyed by prefix token — and prefixes prefer the
  * RAREST tokens, so hot tokens (the skew risk of any token-keyed join)
  * appear only in the prefixes of sets barely larger than the threshold
  * demands. Verification joins the two sorted adjacency arrays and counts
  * the intersection with the codegen'd
  * [[graft.functions.SortedIntersectCount]] merge loop. All arithmetic is
  * integer (sizes, counts, ppm floor-division) — oracle-replayable.
  */
object SetSimJoin {

  /** Pairs (u, v, inter, n_u, n_v, jaccard_ppm) with u < v and
    * inter·10⁶ ≥ thresholdPpm·(n_u + n_v − inter), from a (id, token)
    * membership table. */
  def jaccardJoin(pairs: DataFrame, idCol: String, tokenCol: String,
                  thresholdPpm: Long): DataFrame = {
    val spark = pairs.sparkSession
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val m = pairs.select(col(idCol).as("id"), col(tokenCol).as("tok"))
      .distinct()
    val freq = m.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val sz = m.groupBy(col("id")).agg(count(lit(1)).as("n"))
    // prefix length |S| - ceil(t·|S|) + 1, all integer:
    // ceil(t_ppm·n / 1e6) = (t_ppm·n + 999999) div 1e6 (true integral
    // div, not double `/` — the losslessness proof needs exact floor)
    val prefLen = col("n") -
      expr(s"($thresholdPpm * n + 999999) div 1000000") + lit(1L)
    val w = Window.partitionBy(col("id")).orderBy(col("df"), col("tok"))
    val prefix = m.join(freq, "tok").join(sz, "id")
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= prefLen)
      .select(col("tok"), col("id"))
    val cands = prefix.as("a").join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
      .select(col("a.id").as("u"), col("b.id").as("v"))
      .distinct()
    val adj = m.groupBy(col("id"))
      .agg(sort_array(collect_list(col("tok"))).as("adj"),
        count(lit(1)).as("n"))
    val verified = cands
      .join(adj.select(col("id").as("u"), col("adj").as("adjU"),
        col("n").as("n_u")), "u")
      .join(adj.select(col("id").as("v"), col("adj").as("adjV"),
        col("n").as("n_v")), "v")
      .withColumn("inter",
        call_function(graft.functions.GraftFunctions.Name,
          col("adjU"), col("adjV")))
      .filter(col("inter") * lit(1000000L) >=
        lit(thresholdPpm) * (col("n_u") + col("n_v") - col("inter")))
    verified.select(col("u"), col("v"), col("inter"), col("n_u"),
      col("n_v"),
      expr("(inter * 1000000) div (n_u + n_v - inter)").as("jaccard_ppm"))
  }
}
