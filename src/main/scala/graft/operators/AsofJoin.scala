package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for every left row, the LATEST right row
  * of the same key whose timestamp is at-or-before the left timestamp.
  * The workhorse of feature backfill over event streams (attach the most
  * recent profile / price / purchase to each observation) and the one
  * classic temporal operator Spark lacks as a builtin.
  *
  * Scale shape: the naive formulation (equi-join on key + `r.ts <= l.ts`
  * + max-per-left) explodes to |left| × |right-per-key| rows before the
  * argmax prunes. This implementation is the single-shuffle union trick:
  * tag right rows 0 and left rows 1, sort each key's rows once by
  * (ts, tag, payload), and carry the last non-null payload forward with a
  * running `last(ignoreNulls)` window. One shuffle on the key, O(n log n)
  * per key, zero row amplification — the same plan a stream-table join
  * would compile to. At equal timestamps the right row sorts FIRST
  * (tag 0 < 1), so a marker is visible to observations at its own
  * timestamp ("at-or-before"); right rows tied on (key, ts) resolve to
  * the lexicographically-largest payload tuple (deterministic).
  *
  * Left rows with no prior right row keep null payloads (left-outer
  * semantics) — callers coalesce to sentinels if needed.
  */
object AsofJoin {

  /** @param left     observation table (keeps ALL its columns)
    * @param right    state table: must contain `key`, `rightTs`, `payload`
    * @param key      equi-join key column name (same name both sides)
    * @param leftTs   left timestamp column name
    * @param rightTs  right timestamp column name
    * @param payload  right columns to carry (must not clash with left's) */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.forall(!leftCols.contains(_)),
      s"payload ${payload.mkString(",")} clashes with left columns")
    // the payload travels as ONE struct so the left row receives the
    // single latest right ROW atomically — carrying each column with its
    // own last(ignoreNulls) would stitch fields from DIFFERENT right rows
    // whenever a later row holds NULL in one payload column
    val plType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(p)))
    val l = left.select(
      col(key) +: col(leftTs).as("__asof_ts") +: lit(1).as("__asof_tag") +:
        (leftCols.filterNot(_ == key).map(col) :+
          lit(null).cast(plType).as("__asof_pl")): _*)
    val r = right.select(
      col(key) +: col(rightTs).as("__asof_ts") +: lit(0).as("__asof_tag") +:
        (leftCols.filterNot(_ == key)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          struct(payload.map(col): _*).as("__asof_pl")): _*)
    // at equal (key, ts): right-before-left via the tag; ties among right
    // rows ordered by the payload struct (lexicographic by field) so
    // "last" is deterministic
    val w = Window.partitionBy(col(key))
      .orderBy(col("__asof_ts"), col("__asof_tag"), col("__asof_pl"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r).withColumn("__asof_pl",
      last(col("__asof_pl"), ignoreNulls = true).over(w))
    carried.filter(col("__asof_tag") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("__asof_pl").getField(p).as(p)): _*)
  }
}
