package graft

import graft.operators.AsofJoin
import graft.streaming.Streaming
import graft.text.{QualityRules, TfIdf}
import org.apache.spark.sql.functions._

/** Round-4 operators: as-of join, frequent-phrase boilerplate, tf-idf
  * top terms, sliding event-time windows. */
class TemporalTextSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofBackward: NULL payload fields travel atomically (one row)") {
    // the latest right row holds (p1=NULL, p2=7); the left row must get
    // BOTH fields from that row — not p1 backfilled from the older row
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "x"))
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Option(5L), Option(3L)),
      (1L, ts("2024-01-01 11:00:00"), Option.empty[Long], Option(7L))
    ).toDF("k", "rts", "p1", "p2")
    val r = AsofJoin.asofBackward(left, right, "k", "ts", "rts",
      Seq("p1", "p2")).select(col("p1"), col("p2")).head()
    assert(r.isNullAt(0), "p1 must be the latest row's NULL, not 5")
    assert(r.getLong(1) === 7L)
  }

  test("asofBackward: latest at-or-before row per key, outer nulls, ties") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 12:00:00"), "b"),
      (1L, ts("2024-01-01 09:00:00"), "pre"), // before any right row
      (2L, ts("2024-01-01 10:30:00"), "c"),
      (3L, ts("2024-01-01 10:00:00"), "lonely") // key with no right rows
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L), // equal ts: visible to "a"
      (1L, ts("2024-01-01 11:00:00"), 101L),
      (2L, ts("2024-01-01 10:00:00"), 200L),
      (2L, ts("2024-01-01 10:00:00"), 201L)  // tie: larger payload wins
    ).toDF("k", "rts", "pay")
    val out = AsofJoin.asofBackward(left, right, "k", "ts", "rts",
        Seq("pay"))
      .select(col("tag"), col("pay")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out == Map("a" -> 100L, "b" -> 101L, "pre" -> -1L,
      "c" -> 201L, "lonely" -> -1L))
  }

  test("frequentPhraseStats: df threshold, short docs, ppm and gate") {
    // phrase "a b c d e" appears in docs 1,2,3 (df=3 >= 2 -> boilerplate,
    // twice in doc 3); "v w x y z" only in doc 4 (df=1); doc 5 too short
    val docs = Seq(
      (1L, "a b c d e tail1"),
      (2L, "head2 a b c d e"),
      (3L, "a b c d e a b c d e"),
      (4L, "v w x y z"),
      (5L, "too short")
    ).toDF("doc_id", "text")
    val r = QualityRules.frequentPhraseStats(docs, "doc_id", "text",
        n = 5, minDf = 2L, boilerPpmMax = 400000L)
      .orderBy("doc_id").collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(2L, 2L, 6L, 1L, 0L)) // n_phrases
    assert(r.map(_.getLong(2)).toSeq == Seq(1L, 1L, 2L, 0L, 0L)) // n_boiler
    assert(r.map(_.getLong(3)).toSeq ==
      Seq(500000L, 500000L, 333333L, 0L, 0L))
    assert(r.map(_.getLong(4)).toSeq == Seq(0L, 0L, 1L, 1L, 1L)) // keep
  }

  test("tfidf topTermsIdfPpm: rare terms outrank common, ties by term") {
    // N=3; 'common' df=3 (idf 1000000), 'rare' df=1 (idf 3000000)
    val docs = Seq(
      (1L, "common rare common"),
      (2L, "common zeta zeta"),
      (3L, "common")
    ).toDF("doc_id", "text")
    val r = TfIdf.topTermsIdfPpm(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank")
      .select("doc_id", "rank", "term", "score").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getLong(3)))
    assert(r.toSeq == Seq(
      (1L, 1L, "rare", 3000000L),   // 1 * 3000000 > 2 * 1000000
      (1L, 2L, "common", 2000000L),
      (2L, 1L, "zeta", 6000000L),   // 2 * 3000000
      (2L, 2L, "common", 1000000L),
      (3L, 1L, "common", 1000000L)))
  }

  test("slidingAgg: each event in exactly window/slide epoch-aligned windows") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:10:00"), "x", 1.0),
      (2L, ts("2024-01-01 00:20:00"), "x", 10.0)
    ).toDF("event_id", "ts", "event_type", "value")
    val r = Streaming.slidingAgg(ev, 60, 15)
      .orderBy("win_start")
      .select(date_format(col("win_start"), "HH:mm").as("w"), col("n"),
        col("sum_value")).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2)))
    // event1 windows start 23:15..00:00 (+00:00); event2 23:30..00:15;
    // overlap on 23:30, 23:45, 00:00
    assert(r.toSeq == Seq(
      ("23:15", 1L, 1.0), ("23:30", 2L, 11.0), ("23:45", 2L, 11.0),
      ("00:00", 2L, 11.0), ("00:15", 1L, 10.0)))
  }

  test("collocationLiftPpm: hand-traced contingency table, hapax dropped") {
    val docs = Seq(
      (1L, "new york is big"),
      (2L, "new york new york"),
      (3L, "big apple is big")
    ).toDF("doc_id", "text")
    // bigrams: (new,york)x3 (york,is) (is,big)x2 (york,new) (big,apple)
    // (apple,is) -> B=9; left marginals new=3 is=2; right york=3 big=2
    // kept (n_xy>=2): (new,york) lift=((3e6 div 3)*9) div 3 = 3,000,000
    //                 (is,big)   lift=((2e6 div 2)*9) div 2 = 4,500,000
    val r = TfIdf.collocationLiftPpm(docs, "doc_id", "text",
        minCount = 2, k = 20)
      .collect().map(x =>
        (x.getString(0), x.getString(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(
      ("is", "big", 2L, 4500000L),
      ("new", "york", 3L, 3000000L)))
  }

  test("temporal contacts: banded bucket join equals the direct join") {
    val base = ts("2024-01-01 00:00:00").getTime
    // events straddling bucket boundaries at delta = 60 s
    val events = Seq(
      (1L, "a", 0L), (2L, "a", 59L), (3L, "a", 61L), (4L, "a", 121L),
      (5L, "b", 10L), (6L, "b", 70L), (7L, "b", 71L), (1L, "b", 130L),
      (8L, "a", 59L) // equal-time pair with user 2
    ).map { case (u, g, s) =>
      (u, g, new java.sql.Timestamp(base + s * 1000L))
    }.toDF("user_id", "event_type", "ts")
    val banded = graft.kernels.TemporalReach
      .contacts(events, "user_id", "event_type", "ts", deltaSec = 60L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val ev = events.select(col("user_id").as("u"), col("event_type").as("g"),
      unix_micros(col("ts")).as("t"))
    val direct = ev.as("a").join(ev.as("b"),
        col("a.g") === col("b.g") &&
          col("b.t") >= col("a.t") &&
          col("b.t") - col("a.t") <= 60000000L &&
          (col("a.t") < col("b.t") ||
            (col("a.t") === col("b.t") && col("a.u") < col("b.u"))) &&
          col("a.u") =!= col("b.u"))
      .select(col("a.u"), col("b.u"), col("a.t"), col("b.t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(direct.nonEmpty && banded == direct)
  }

  test("earliestArrival: time-respecting semantics (static reach overcounts)") {
    import graft.kernels.TemporalReach
    // 1 -(dep 10, arr 12)-> 2 -(dep 11, arr 13)-> 3: the 2->3 contact
    // departs BEFORE 2 is reached, so 3 is temporally unreachable even
    // though it is statically reachable; 2 -(dep 15, arr 20)-> 4 works
    val contacts = Seq(
      (1L, 2L, 10L, 12L), (2L, 3L, 11L, 13L), (2L, 4L, 15L, 20L)
    ).toDF("src", "dst", "tu", "tv")
    val seeds = Seq(1L).toDF("vid")
    val fix = TemporalReach.earliestArrival(spark, contacts, seeds)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fix == Map(1L -> 0L, 2L -> 12L, 4L -> 20L))
    // bounded prefix: one round reaches only 2
    val r1 = TemporalReach.earliestArrival(spark, contacts, seeds,
      maxRounds = 1).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(r1 == Map(1L -> 0L, 2L -> 12L))
  }

  test("earliestArrival picks the minimum arrival over competing paths") {
    import graft.kernels.TemporalReach
    // two time-respecting paths to 4: via 2 arriving 30, via 3 arriving 25
    val contacts = Seq(
      (1L, 2L, 1L, 5L), (2L, 4L, 6L, 30L),
      (1L, 3L, 2L, 10L), (3L, 4L, 12L, 25L),
      // a cheaper contact into 4 that departs 3 too early to use
      (3L, 4L, 9L, 15L)
    ).toDF("src", "dst", "tu", "tv")
    val got = TemporalReach.earliestArrival(spark, contacts,
        Seq(1L).toDF("vid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 0L, 2L -> 5L, 3L -> 10L, 4L -> 25L))
  }

  test("chainMotifs: relay must depart after arrival, span within window") {
    import graft.kernels.TemporalReach
    val contacts = Seq(
      (1L, 2L, 10L, 12L),  // u=1 -> v=2 arriving 12
      (2L, 3L, 15L, 18L),  // relay departs 15 >= 12: chain 1->2->3
      (2L, 4L, 11L, 13L),  // departs 11 < 12: NOT a chain
      (2L, 5L, 500L, 620L) // departs late: span 620-10=610 > 600 window
    ).toDF("src", "dst", "tu", "tv")
    val got = TemporalReach.chainMotifs(contacts, windowUs = 600L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(2L -> 1L))
  }

  test("funnel stages: order matters, earliest-completion semantics") {
    import graft.operators.Funnel
    val base = ts("2024-01-01 00:00:00").getTime
    def t(s: Long) = new java.sql.Timestamp(base + s * 1000L)
    val events = Seq(
      // user 1: full funnel in order
      (1L, "view", t(10)), (1L, "click", t(20)), (1L, "purchase", t(30)),
      // user 2: click BEFORE the first view -> stage 1 only
      (2L, "click", t(5)), (2L, "view", t(10)),
      // user 3: view then click, purchase before the click -> stage 2
      (3L, "purchase", t(12)), (3L, "view", t(10)), (3L, "click", t(15)),
      // user 4: only non-funnel events -> absent from the universe
      (4L, "error", t(10)),
      // user 5: view only
      (5L, "view", t(50)),
      // user 6: equal timestamps — click at the SAME instant as the view
      // does not count (strictly-after rule)
      (6L, "view", t(7)), (6L, "click", t(7))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.stages(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))))
      .toMap
    def us(s: Long) = (base / 1000L + s) * 1000000L
    assert(got == Map(
      1L -> ((3L, us(30))),
      2L -> ((1L, us(10))),
      3L -> ((2L, us(15))),
      5L -> ((1L, us(50))),
      6L -> ((1L, us(7)))))
  }

  test("funnel census counts every reached stage including zero") {
    import graft.operators.Funnel
    val base = ts("2024-01-01 00:00:00").getTime
    def t(s: Long) = new java.sql.Timestamp(base + s * 1000L)
    val events = Seq(
      (1L, "view", t(1)), (1L, "click", t(2)),
      (2L, "click", t(1)), // never views -> stage 0
      (3L, "view", t(1))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.census(events, "user_id", "event_type", "ts",
        Seq("view", "click"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("retention triangle: hand-traced cohorts and ppm shares") {
    import graft.operators.Cohorts
    def t(day: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d $h%02d:00:00")
    // users 1,2 join day 0; user 1 returns day 1 and 2; user 3 joins
    // day 1; duplicate same-day events collapse
    val events = Seq(
      (1L, t(0, 1)), (1L, t(0, 5)), (2L, t(0, 2)),
      (1L, t(1, 3)), (3L, t(1, 4)), (1L, t(2, 9))
    ).toDF("user_id", "ts")
    val got = Cohorts.retention(events, "user_id", "ts")
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val d0 = got.keys.map(_._1).min
    assert(got((d0, 0L)) === ((2L, 2L, 1000000L)))
    assert(got((d0, 1L)) === ((1L, 2L, 500000L)))
    assert(got((d0, 2L)) === ((1L, 2L, 500000L)))
    assert(got((d0 + 1L, 0L)) === ((1L, 1L, 1000000L)))
    assert(got.size === 4)
  }

  test("convertLatency: strict first-after ordering and median bucket") {
    import graft.operators.Cohorts
    val base = ts("2024-01-01 00:00:00").getTime
    def t(s: Long) = new java.sql.Timestamp(base + s * 1000L)
    val events = Seq(
      // u1: view @0, purchase @1800s -> bucket 0
      (1L, "view", t(0)), (1L, "purchase", t(1800)),
      // u2: purchase BEFORE first view is ignored; later one @2h -> b 2
      (2L, "purchase", t(5)), (2L, "view", t(10)),
      (2L, "purchase", t(10 + 7200)),
      // u3: view only -> drops out
      (3L, "view", t(0)),
      // u4: view @0, purchases @3600s and 7200s -> first wins, b 1
      (4L, "view", t(0)), (4L, "purchase", t(3600)),
      (4L, "purchase", t(7200))
    ).toDF("user_id", "event_type", "ts")
    val got = Cohorts.convertLatency(events, "user_id", "event_type",
        "ts", "view", "purchase")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    // buckets 0,1,2 one user each; median rank (3+1) div 2 = 2 -> b 1
    assert(got.toSeq === Seq((0L, 1L, 1L, 1L), (1L, 1L, 2L, 1L),
      (2L, 1L, 3L, 1L)))
  }

  test("rfm: tercile assignment from value-histogram ranks") {
    import graft.operators.Cohorts
    def t(day: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-${day + 1}%02d 00:00:00")
    // three users, metrics engineered strictly increasing:
    // u1: last day 2, 1 event,  1.00 -> rec 0, freq 1, mband 1
    // u2: last day 1, 2 events, 4.50 -> rec 1, freq 2, mband 4
    // u3: last day 0, 3 events, 9.00 -> rec 2, freq 3, mband 9
    val events = Seq(
      (1L, t(2), 1.0),
      (2L, t(0), 2.0), (2L, t(1), 2.5),
      (3L, t(0), 3.0), (3L, t(0), 3.0), (3L, t(0), 3.0)
    ).toDF("user_id", "ts", "value")
    val got = Cohorts.rfm(events, "user_id", "ts", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // ranks r0 = 0,1,2 of n=3 -> terciles 0,1,2 on every metric; u1 is
    // most recent but least frequent/valuable
    assert(got === Set((0L, 0L, 0L, 1L), (1L, 1L, 1L, 1L),
      (2L, 2L, 2L, 1L)))
  }
}
