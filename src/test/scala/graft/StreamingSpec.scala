package graft

import graft.streaming.Streaming
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Structured Streaming: the windowed aggregation produces the same result
  * run as a bounded file stream and as a batch plan (one transformation,
  * two execution modes).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streamed hourly aggregation equals the batch plan") {
    val rows = Seq(
      ("click", "2026-01-01 00:10:00", 1.0),
      ("click", "2026-01-01 00:50:00", 2.0),
      ("view", "2026-01-01 00:20:00", 3.0),
      ("click", "2026-01-01 01:05:00", 4.0),
      ("view", "2026-01-01 02:59:00", 5.0)
    ).map { case (t, ts, v) => (t, Timestamp.valueOf(ts), v) }
      .toDF("event_type", "ts", "value")

    val dir = Files.createTempDirectory("graft-stream").toString
    rows.repartition(3).write.mode("overwrite").parquet(dir)

    val batch = Streaming.hourlyAgg(spark.read.parquet(dir))
      .collect().map(r => (r.getTimestamp(0), r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    val streamed = Streaming.runBounded(spark, dir,
      spark.read.parquet(dir).schema, "stream_sink")
      .collect().map(r => (r.getTimestamp(0), r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet

    assert(streamed === batch)
    assert(batch.size === 4) // (00h click)(00h view)(01h click)(02h view)
  }
}
