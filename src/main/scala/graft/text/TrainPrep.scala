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
  def sequentialPack(spark: SparkSession, df: DataFrame, idCol: String,
                     nTokensCol: Column, capacity: Long,
                     partitions: Int = 32): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val base = df.select(col(idCol).cast("double").as("idd"),
      col(idCol).as("id"), nTokensCol.cast("long").as("n"))
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
      .select(col("id").as(idCol), col("n").as("n_tokens"),
        floor(col("start") / capacity).as("bin"),
        pmod(col("start"), lit(capacity)).as("bin_offset"))
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
}
