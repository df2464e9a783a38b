package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Compaction planning over a file manifest — the table-maintenance
  * decision pass (Iceberg's rewrite_data_files planning): files below
  * the small-file threshold are candidates, packed in file-id order
  * into output groups of ~`targetBytes` by cumulative size. The plan
  * is pure metadata: its input is the manifest (one row per data
  * file), never the data — at 100 TB that is millions of rows where
  * the table is billions, and the sequential greedy pack is exactly
  * what a single planner node does in production, so the one global
  * window here is a deliberate, documented metadata-scale exception
  * to the no-single-task-window rule ([[graft.text.TrainPrep]]'s
  * two-phase cumsum is the data-scale alternative if manifests ever
  * outgrow one task). */
object Compaction {

  /** One row per manifest file: (fileCol, sizeCol, candidate ∈ {0,1},
    * target_group — the output file this candidate is rewritten into,
    * -1 for non-candidates). Groups are cumulative-size div
    * targetBytes over candidates in file-id order, so every group but
    * the last holds at least one file and closes as soon as it
    * crosses the target. */
  def plan(manifest: DataFrame, fileCol: String, sizeCol: String,
           smallBytes: Long, targetBytes: Long): DataFrame = {
    val w = Window.orderBy(col(fileCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    manifest
      .withColumn("candidate",
        (col(sizeCol) < smallBytes).cast("int"))
      .withColumn("cum_before", coalesce(
        sum(when(col("candidate") === 1, col(sizeCol))).over(w), lit(0L)))
      .select(col(fileCol), col(sizeCol), col("candidate"),
        when(col("candidate") === 1,
          expr(s"cum_before div ${targetBytes}L"))
          .otherwise(lit(-1L)).as("target_group"))
  }
}
