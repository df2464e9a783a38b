package graft

import graft.kernels.{Bfs, GraphStats}
import graft.text.{QualityRules, TrainPrep}
import org.apache.spark.sql.functions._

/** Round-4 operators: repetition gates, PII scrub, fixed-size reservoir
  * sampling, labeled multi-source BFS + harmonic centrality. */
class QualitySpec extends SparkSpec {

  import spark.implicits._

  test("repetitionStats: hand-computed mode/bigram ppm and keep gate") {
    val docs = Seq(
      // 4 tokens, mode 'a' x3 -> 750000 ppm (fails the gate); bigrams
      // [a a, a b, b a] distinct 3/3 -> dup 0
      (1L, "a a b a"),
      // 6 distinct tokens -> top 166666 ppm (passes); dup 0
      (2L, "u v w x y z"),
      // repeated bigram: tokens [p q p q], bigrams [p q, q p, p q] ->
      // dup (3-2)/3 = 333333 ppm (fails); top 500000 (fails)
      (3L, "p q p q")
    ).toDF("doc_id", "text")
    val r = QualityRules.repetitionStats(docs, "doc_id", "text",
        topTokPpmMax = 400000L, dupBigramPpmMax = 100000L)
      .orderBy("doc_id").collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(4L, 6L, 4L)) // n_tokens
    assert(r.map(_.getLong(2)).toSeq == Seq(3L, 1L, 2L)) // top_cnt
    assert(r.map(_.getLong(3)).toSeq == Seq(750000L, 166666L, 500000L))
    assert(r.map(_.getLong(4)).toSeq == Seq(0L, 0L, 333333L))
    assert(r.map(_.getLong(5)).toSeq == Seq(0L, 1L, 0L)) // keep
  }

  test("piiStats: counts and masked sha match a hand-masked document") {
    val docs = Seq(
      (1L, "reach me at jo.na+x@sub.example.org or 192.168.0.1 ok"),
      (2L, "no pii here at all")
    ).toDF("doc_id", "text")
    val r = QualityRules.piiStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 1L && r(0).getLong(2) == 1L)
    assert(r(1).getLong(1) == 0L && r(1).getLong(2) == 0L)
    val expected = spark.sql(
      "SELECT sha2('reach me at <EMAIL> or <IP> ok', 256)").head.getString(0)
    assert(r(0).getString(3) == expected)
    // unplanted text: masked sha == plain sha
    val plain = spark.sql(
      "SELECT sha2('no pii here at all', 256)").head.getString(0)
    assert(r(1).getString(3) == plain)
  }

  test("reservoirSample: exactly k per stratum, partitioning-invariant") {
    val docs = (1L to 200L).map(i => (i, if (i % 4 == 0) "de" else "en"))
      .toDF("doc_id", "lang")
    val a = TrainPrep.reservoirSample(docs.repartition(1),
      "doc_id", "lang", k = 5, salt = "t")
    val b = TrainPrep.reservoirSample(docs.repartition(7),
      "doc_id", "lang", k = 5, salt = "t")
    val sa = a.select("doc_id", "lang", "rnk").orderBy("lang", "rnk")
      .collect().toSeq
    val sb = b.select("doc_id", "lang", "rnk").orderBy("lang", "rnk")
      .collect().toSeq
    assert(sa == sb) // same rows + same ranks regardless of partitioning
    assert(a.groupBy("lang").count().collect()
      .forall(_.getLong(1) == 5L))
    // output keeps the input schema (+rnk), no helper columns leak
    assert(a.columns.toSeq == Seq("doc_id", "lang", "rnk"))
  }

  test("perSeedDistances + harmonic on a path graph, hand-traced") {
    // path 1-2-3-4-5; seeds {1, 4}
    val sym = graft.graph.Edges.symmetrize(
      edgeDF(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))))
    val seeds = Seq(1L, 4L).toDF("vid")
    val d = Bfs.perSeedDistances(sym, seeds, maxHop = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(d == Set(
      (1L, 1L, 0L), (1L, 2L, 1L), (1L, 3L, 2L), (1L, 4L, 3L),
      (4L, 4L, 0L), (4L, 3L, 1L), (4L, 5L, 1L), (4L, 2L, 2L),
      (4L, 1L, 3L)))
    // seed 1: 1/1 + 1/2 + 1/3 -> 1000000 + 500000 + 333333
    val hm = GraphStats.harmonicCentrality(sym, seeds, maxHop = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(hm(1L) == ((3L, 1833333L)))
    // seed 4: two at 1, one at 2, one at 3
    assert(hm(4L) == ((4L, 2833333L)))
  }

  test("deep perSeedDistances compacts its reached set (path, 12 hops)") {
    val sym = graft.graph.Edges.symmetrize(
      edgeDF((1L to 12L).map(i => (i, i + 1))))
    val d = Bfs.perSeedDistances(sym, Seq(1L).toDF("vid"),
      maxHop = 12, compactEvery = 3)
    assert(d.count() == 13L)
    assert(d.filter(col("vid") === 13L).head.getLong(2) == 12L)
  }
}
