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

  test("streaming corpus ingest: micro-batches become catalog snapshots") {
    import graft.catalog.LocalCatalog
    import graft.corpus.{CorpusGen, EdgeDeriver}
    val corpus = CorpusGen.corpus(spark, CorpusGen.Tiny).persist()
    val dir = Files.createTempDirectory("graft-ingest").toString
    // three arrival chunks, one FLAT parquet file each in the watched dir
    // (the file-stream source lists plain files, not nested write dirs)
    for (i <- 0 until 3) {
      val tmp = Files.createTempDirectory(s"graft-chunk$i").toString
      corpus.filter(pmod(xxhash64(col("path")), lit(3)) === i)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).get
      Files.copy(part.toPath,
        java.nio.file.Paths.get(dir, s"chunk$i.parquet"))
    }
    val cat = new LocalCatalog(
      Files.createTempDirectory("graft-ingest-cat").toString)
    val snaps = Streaming.ingestCorpus(spark, dir, corpus.schema,
      cat, "corpus")
    assert(snaps.nonEmpty && snaps == snaps.sorted)
    // the ingested table equals the batch corpus, sha256 row-for-row
    val inSha = cat.read(spark, "corpus")
      .select(sha2(col("content"), 256)).as[String].collect().sorted
    val batchSha = corpus
      .select(sha2(col("content"), 256)).as[String].collect().sorted
    assert(inSha.sameElements(batchSha))
    // derivation over the streamed catalog == derivation over the batch
    val viaCatalog = EdgeDeriver.edges(cat.read(spark, "corpus"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val direct = EdgeDeriver.edges(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(viaCatalog.sameElements(direct))
    // earlier snapshots see strictly less data (incremental ingest)
    assert(cat.readSnapshot(spark, "corpus", snaps.head).count()
      < corpus.count())
    corpus.unpersist()
  }

  test("streaming upsert ingest: per-batch MERGE equals one-shot merge") {
    import graft.catalog.LocalCatalog
    val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
      (4L, "d", 40L)).toDF("id", "lang", "n")
    val feed = Seq((2L, "xx", 27L), (4L, "xx", 47L), (9L, "xx", 90L))
      .toDF("id", "lang", "n")
    val cat = new LocalCatalog(
      Files.createTempDirectory("graft-upsert-cat").toString)
    cat.createOrReplace("t", base)
    val feedDir = Files.createTempDirectory("graft-upsert-feed").toString
    feed.repartition(3).write.mode("overwrite").parquet(feedDir)
    val snaps = Streaming.ingestUpsert(spark, feedDir, feed.schema,
      cat, "t", "id")
    assert(snaps.nonEmpty && snaps == snaps.sorted)
    val got = cat.read(spark, "t").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // matched keys updated, new key inserted, untouched rows carried
    assert(got === Set((1L, "a", 10L), (2L, "xx", 27L), (3L, "c", 30L),
      (4L, "xx", 47L), (9L, "xx", 90L)))
  }

  test("flatMapGroupsWithState sessionization: stream equals batch") {
    def mk(id: Long, u: Long, ts: String, v: Double) =
      (id, u, Timestamp.valueOf(ts), v)
    // three arrival chunks in event-time order; the last carries per-user
    // flush sentinels far beyond the gap so every real session closes
    val chunks = Seq(
      Seq(mk(1, 1, "2026-01-01 00:00:00", 1.0),
        mk(2, 2, "2026-01-01 00:05:00", 2.0)),
      Seq(mk(3, 1, "2026-01-01 00:10:00", 3.0),
        mk(4, 2, "2026-01-01 00:20:00", 4.0)),
      Seq(mk(5, 1, "2026-01-01 02:00:00", 5.0),
        mk(6, 2, "2026-01-01 00:30:00", 6.0),
        mk(98, 1, "2026-01-10 00:00:00", 0.0),
        mk(99, 2, "2026-01-10 00:00:00", 0.0)))
    val dir = Files.createTempDirectory("graft-sess").toString
    chunks.zipWithIndex.foreach { case (c, i) =>
      val tmp = Files.createTempDirectory(s"graft-sess$i").toString
      c.toDF("event_id", "user_id", "ts", "value")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).get
      Files.copy(part.toPath,
        java.nio.file.Paths.get(dir, s"chunk$i.parquet"))
    }
    val all = spark.read.parquet(dir)
    val flushUs = Timestamp.valueOf("2026-01-10 00:00:00").getTime * 1000L

    val ds = Streaming.sessionizeStream(spark,
      spark.readStream.schema(all.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir), gapMinutes = 30)
    val q = ds.writeStream.format("memory").queryName("sess_sink")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sess_sink").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet

    // batch twin on the same files, minus the sentinel-only sessions
    val batch = Streaming.sessionizeBatch(all, 30)
      .filter(col("session_start_us") < flushUs)
      .select(col("user_id"), col("session_start_us"),
        col("session_end_us"), col("n_events"), col("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet

    assert(streamed === batch)
    // the expected sessions, spelled out
    def us(ts: String) = Timestamp.valueOf(ts).getTime * 1000L
    assert(batch === Set(
      (1L, us("2026-01-01 00:00:00"), us("2026-01-01 00:10:00"), 2L, 4.0),
      (1L, us("2026-01-01 02:00:00"), us("2026-01-01 02:00:00"), 1L, 5.0),
      (2L, us("2026-01-01 00:05:00"), us("2026-01-01 00:30:00"), 3L, 12.0)))
  }

  test("watermarked streaming dedup: key set equals the batch twin") {
    def mk(id: Long, u: Long, t: String, ts: String) =
      (id, u, t, Timestamp.valueOf(ts), 1.0)
    val rows = Seq(
      mk(1, 1, "click", "2026-01-01 00:00:00"),
      mk(2, 1, "click", "2026-01-01 00:05:00"), // dup of (1, click)
      mk(3, 1, "view", "2026-01-01 00:06:00"),
      mk(4, 2, "click", "2026-01-01 00:07:00"),
      mk(5, 2, "click", "2026-01-01 00:20:00"), // dup of (2, click)
      mk(6, 1, "view", "2026-01-01 01:00:00")   // dup of (1, view)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val dir = Files.createTempDirectory("graft-dedup").toString
    rows.repartition(2).write.mode("overwrite").parquet(dir)
    val keys = Seq("user_id", "event_type")

    val q = Streaming.dedupStream(
        spark.readStream.schema(rows.schema)
          .option("maxFilesPerTrigger", 1).parquet(dir), keys)
      .writeStream.format("memory").queryName("dedup_sink")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("dedup_sink")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))

    val batch = Streaming.dedupBatch(spark.read.parquet(dir), keys)
    val batchKeys = batch.select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // one row per distinct key on both paths, same key set
    assert(streamed.length == streamed.distinct.length)
    assert(streamed.toSet === batchKeys.toSet)
    assert(batchKeys.toSet ===
      Set((1L, "click"), (1L, "view"), (2L, "click")))
    // batch twin picks the FIRST (ts, event_id) row and counts dups
    val first = batch.collect().map(r =>
      ((r.getLong(0), r.getString(1)), (r.getLong(3), r.getLong(4)))).toMap
    assert(first((1L, "click")) == (1L, 2L))
    assert(first((1L, "view")) == (3L, 2L))
    assert(first((2L, "click")) == (4L, 2L))
  }

  test("late-data quarantine ledger replays the sha-jitter classification") {
    def mk(id: Long, ts: String) = (id, Timestamp.valueOf(ts))
    val rows = Seq(
      mk(1, "2026-01-01 00:00:30"), mk(2, "2026-01-01 00:07:00"),
      mk(3, "2026-01-01 00:09:59"), mk(4, "2026-01-01 00:12:00"),
      mk(5, "2026-01-01 00:15:00"), mk(6, "2026-01-01 00:19:30")
    ).toDF("event_id", "ts")
    val got = Streaming.lateAccounting(rows, "event_id", "ts",
        windowMin = 10, latenessMin = 5, maxJitterMin = 20)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // single-threaded replay of the fixed-delay watermark model
    val expect = Seq(
      (1L, "2026-01-01 00:00:30"), (2L, "2026-01-01 00:07:00"),
      (3L, "2026-01-01 00:09:59"), (4L, "2026-01-01 00:12:00"),
      (5L, "2026-01-01 00:15:00"), (6L, "2026-01-01 00:19:30"))
      .map { case (id, t) =>
        val es = Timestamp.valueOf(t).getTime / 1000L
        val ws = es - es % 600
        val delay = es + (Oracles.sha60(id.toString) % 20) * 60 - (ws + 600)
        (ws, if (delay <= 0) 0 else if (delay <= 300) 1 else 2)
      }
      .groupBy(_._1).map { case (ws, g) =>
        ws -> ((g.count(_._2 == 0).toLong, g.count(_._2 == 1).toLong,
          g.count(_._2 == 2).toLong))
      }
    assert(got === expect)
    // the jitter spread actually exercises all three classes
    val totals = got.values.foldLeft((0L, 0L, 0L)) { case (a, b) =>
      (a._1 + b._1, a._2 + b._2, a._3 + b._3) }
    assert(totals._1 + totals._2 + totals._3 === 6L)
  }

  test("ewmaAnomaly: hand-traced fixed-point trace with a silent hour") {
    // type a: hour 0 four events (seed e=4e6), hour 1 SILENT (densified,
    // decays e to 3e6), hour 2 one event (e -> 2.5e6), hour 3 ten events
    // (10e6 > 3*2.5e6 -> spike, e -> (7.5e6+10e6)/4)
    def ev(h: Long, k: Int): Seq[(String, Long)] =
      Seq.fill(k)(("a", h * 3600L + 7L))
    val events = (ev(0, 4) ++ ev(2, 1) ++ ev(3, 10))
      .toDF("event_type", "sec")
      .select(col("event_type"), to_timestamp(col("sec")).as("ts"))
    val got = Streaming.ewmaAnomaly(events)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(got === Array(
      (0L, 4L, -1L, 0L),
      (1L, 0L, 4000000L, 0L),
      (2L, 1L, 3000000L, 0L),
      (3L, 10L, 2500000L, 1L)))
  }

  test("stream-stream attribution interval join equals the batch twin") {
    def mk(id: Long, u: Long, t: String, ts: String) =
      (id, u, t, Timestamp.valueOf(ts), 0.0)
    val rows = Seq(
      mk(1, 1, "view", "2026-01-01 00:00:00"),
      mk(2, 1, "click", "2026-01-01 00:03:00"), // credits view 1
      mk(3, 1, "view", "2026-01-01 00:05:00"),
      mk(4, 1, "click", "2026-01-01 00:06:00"), // credits view 3 only
      mk(5, 2, "click", "2026-01-01 00:01:00"), // no prior view
      mk(6, 2, "view", "2026-01-01 00:10:00"),  // no later click
      mk(7, 1, "click", "2026-01-01 00:05:00")  // ties view 3: NOT > its ts
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val dir = Files.createTempDirectory("graft-attr").toString
    rows.repartition(2).write.mode("overwrite").parquet(dir)

    val expected = Set((1L, 1L, 2L), (1L, 1L, 7L), (1L, 3L, 4L))
    val batch = Streaming.attributionBatch(spark.read.parquet(dir), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(batch == expected) // (user, view_id, click_id)

    val src = spark.readStream.schema(rows.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = Streaming.attributionStream(
        src.filter(col("event_type") === "view"),
        src.filter(col("event_type") === "click"), 5)
      .writeStream.format("memory").queryName("attr_sink")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("attr_sink")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(streamed == expected)
  }

  test("gap throttle: stream kept set equals the batch twin, hand-traced") {
    def mk(id: Long, u: Long, t: String, ts: String) =
      (id, u, t, Timestamp.valueOf(ts), 1.0)
    // user 1 click: 0s, 30s (drop), 50s (drop — 20s after PREVIOUS event,
    // kept or not), 200s (keep); user 1 view at 10s independent key
    val chunks = Seq(
      Seq(mk(1, 1, "click", "2026-01-01 00:00:00"),
        mk(2, 1, "view", "2026-01-01 00:00:10")),
      Seq(mk(3, 1, "click", "2026-01-01 00:00:30"),
        mk(4, 1, "click", "2026-01-01 00:00:50"),
        mk(5, 2, "click", "2026-01-01 00:01:00")),
      Seq(mk(6, 1, "click", "2026-01-01 00:03:20")))
    val dir = Files.createTempDirectory("graft-thr").toString
    chunks.zipWithIndex.foreach { case (c, i) =>
      val tmp = Files.createTempDirectory(s"graft-thr$i").toString
      c.toDF("event_id", "user_id", "event_type", "ts", "value")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).get
      Files.copy(part.toPath,
        java.nio.file.Paths.get(dir, s"chunk$i.parquet"))
    }
    val all = spark.read.parquet(dir)

    val ds = Streaming.throttleStream(spark,
      spark.readStream.schema(all.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir), gapSec = 60)
    val q = ds.writeStream.format("memory").queryName("thr_sink")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("thr_sink").collect()
      .map(r => r.getLong(3)).toSet
    assert(kept === Set(1L, 2L, 5L, 6L))

    // batch ledger agrees per key
    val batch = Streaming.throttleBatch(all, 60)
      .collect().map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(batch === Map((1L, "click") -> ((4L, 2L)),
      (1L, "view") -> ((1L, 1L)), (2L, "click") -> ((1L, 1L))))
  }

  test("intervalOverlap: binned pairs equal brute force, counted once") {
    // intervals crafted around the 512 s bin boundary: a pair overlapping
    // ACROSS bins must appear exactly once
    def mk(id: Long, startSec: Long, durSec: Double) =
      (id, 1L, "op", new Timestamp(startSec * 1000L), durSec)
    val rows = Seq(
      mk(1, 100, 50.0),   // [100,150]
      mk(2, 120, 10.9),   // [120,130] overlaps 1
      mk(3, 500, 100.0),  // [500,600] spans bins 0/1
      mk(4, 590, 5.0),    // [590,595] bin 1, overlaps 3
      mk(5, 145, 400.0),  // [145,545] overlaps 1, 3 (145<=150, 500<=545)
      mk(6, 2000, 1.0))   // isolated
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = Streaming.intervalOverlap(rows, binSec = 512)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // no pair twice
    assert(got.map(p => (p._1, p._2)).distinct.length === got.length)
    val expected = Set((1L, 2L, 10L), (3L, 4L, 5L), (1L, 5L, 5L),
      (3L, 5L, 45L))
    assert(got.toSet === expected)
  }
}
