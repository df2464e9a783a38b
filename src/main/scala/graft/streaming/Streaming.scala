package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface.
  *
  * The reference is batch-only (SURVEY §2.9 — its closest analogs are the
  * periodic `sys_sync` telemetry timers, `core/slave.tpp:893-964`); the
  * streaming layer here covers the incremental-ingest side of a production
  * deployment: events/corpus rows arriving as files are aggregated with
  * event-time windows + watermark, and the SAME transformation function is
  * used by the batch queries — one definition, two execution modes
  * (`readStream` vs `read`), which is exactly how Structured Streaming is
  * meant to be used. State stays bounded via the watermark; the windowed
  * aggregation is a streaming-safe partial+final hash agg.
  */
object Streaming {

  /** Event-time hourly counts/sums per event type — the shared plan.
    * Works on a batch DataFrame or a streaming one unchanged. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))

  /** File-source stream over a directory of event parquet files. */
  def eventStream(spark: SparkSession, dir: String,
                  schema: StructType): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 4)
      .parquet(dir)

  /** Run the hourly aggregation over a directory as a bounded stream
    * (processAllAvailable + stop), returning the result table — used by
    * tests to prove stream/batch plan equivalence. */
  def runBounded(spark: SparkSession, dir: String, schema: StructType,
                 sinkTable: String): DataFrame = {
    val q = hourlyAgg(eventStream(spark, dir, schema))
      .writeStream
      .format("memory")
      .queryName(sinkTable)
      .outputMode("complete")
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(sinkTable)
  }

  /** Streaming corpus ingest into the snapshot catalog: corpus files
    * arriving in `dir` are appended batch-by-batch as catalog snapshots
    * (`foreachBatch` → `CatalogAdapter.append`), giving the incremental-
    * derivation entry point the production system would run continuously
    * — each micro-batch commit is a new snapshot, the edge derivation
    * reads the latest one, and time travel reaches any ingest point.
    * Bounded run (processAllAvailable + stop); returns committed
    * snapshot ids in commit order. */
  def ingestCorpus(spark: SparkSession, dir: String, schema: StructType,
                   catalog: graft.catalog.CatalogAdapter,
                   table: String): Seq[Long] = {
    val snaps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) { snaps += catalog.append(table, batch.toDF()) }
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    snaps.toSeq
  }
}
