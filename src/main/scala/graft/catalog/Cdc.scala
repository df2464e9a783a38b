package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level change-data-capture between two table snapshots — the
  * generic complement of the graph-shaped snapshot diff (q123 compares
  * derived degrees; this compares the ROWS, which is what an incremental
  * downstream consumer of the catalog actually tails). Iceberg calls
  * this the changelog scan; here it is derived from any two snapshots,
  * so it also works across non-adjacent snapshots.
  *
  * Shape: each side is projected to (key, sha256 of the selected
  * payload columns) — one narrow row per input row — then ONE full outer
  * join on the key classifies insert / delete / update. Nothing wider
  * than (key, 64-char hash) ever shuffles, payloads stay where they are.
  */
object Cdc {

  /** (key, op) with op ∈ {insert, delete, update}; unchanged rows are
    * not emitted. `payloadCols` define row identity beyond the key. */
  def rowDiff(before: DataFrame, after: DataFrame, key: String,
              payloadCols: Seq[String]): DataFrame = {
    def sig(df: DataFrame): DataFrame = df.select(col(key),
      sha2(concat_ws("", payloadCols.map(c =>
        col(c).cast("string")): _*), 256).as("h"))
    val b = sig(before).withColumnRenamed("h", "hb")
    val a = sig(after).withColumnRenamed("h", "ha")
    b.join(a, Seq(key), "full_outer")
      .select(col(key),
        when(col("hb").isNull, "insert")
          .when(col("ha").isNull, "delete")
          .when(col("hb") =!= col("ha"), "update")
          .as("op"))
      .filter(col("op").isNotNull)
  }

  /** Optimistic-concurrency write-write validation (Iceberg's
    * serializable-isolation commit check): a transaction staged against
    * `base` may commit onto `current` only where its write set does not
    * touch a key some OTHER commit changed in between. Returns the
    * write set keyed rows tagged conflicted ∈ {0,1}: conflicted keys
    * must abort/rebase, clean keys are safe to apply. Shape: the
    * changed-key set is [[rowDiff]] (narrow key+hash full-outer join);
    * the verdict is one more key-only join — the payloads never move. */
  def conflictKeys(base: DataFrame, current: DataFrame, key: String,
                   payloadCols: Seq[String],
                   writeSet: DataFrame): DataFrame = {
    val changed = rowDiff(base, current, key, payloadCols)
      .select(col(key), lit(1).as("conflicted"))
    writeSet.select(col(key)).distinct()
      .join(changed, Seq(key), "left_outer")
      .select(col(key), coalesce(col("conflicted"), lit(0)).as("conflicted"))
  }
}
