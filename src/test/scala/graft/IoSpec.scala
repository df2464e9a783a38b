package graft

import graft.graph.Edges
import graft.sources.GraphIO
import graft.text.TrainPrep
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Round-trip equality for the four reference text-format writers/readers
  * and the training-prep operators (sequential packing, hash split). */
class IoSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-io").toString

  private lazy val sym =
    Edges.symmetrize(edgeDF(Oracles.powerLaw(40, seed = 7)))

  test("normal format: write -> read is the identity on (src, sorted adj)") {
    val adj = Edges.adjacency(sym)
    val dir = tmp()
    GraphIO.writeNormalAdj(adj, s"$dir/g")
    val back = GraphIO.readNormalAdj(spark, s"$dir/g")
    val want = adj.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val got = back.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got === want)
  }

  test("label format: write -> read preserves per-neighbor labels") {
    val lab = Edges.adjacency(sym).select(col("src"),
      concat(lit("L"), pmod(col("src"), lit(3)).cast("string")).as("label"),
      col("adj").as("nbrs"),
      transform(col("adj"),
        n => concat(lit("L"), pmod(n, lit(3)).cast("string"))).as("labels"))
    val dir = tmp()
    GraphIO.writeLabelAdj(lab, s"$dir/g")
    val back = GraphIO.readLabelAdj(spark, s"$dir/g")
    val want = lab.collect().map(r => (r.getLong(0), r.getString(1),
      r.getSeq[Long](2), r.getSeq[String](3))).toSet
    val got = back.collect().map(r => (r.getLong(0), r.getString(1),
      r.getSeq[Long](2), r.getSeq[String](3))).toSet
    assert(got === want)
  }

  test("attr format: write -> read sorts/dedups attrs and drops '0'") {
    val at = Edges.adjacency(sym).select(col("src"),
      // unsorted, duplicated, with a '0' placeholder the reader must drop
      array(lit("z"), concat(lit("a"), pmod(col("src"), lit(2)).cast("string")),
        lit("z"), lit("0")).as("attrs"),
      col("adj"))
    val dir = tmp()
    GraphIO.writeAttrAdj(at, s"$dir/g")
    val back = GraphIO.readAttrAdj(spark, s"$dir/g")
    val got = back.collect()
      .map(r => r.getLong(0) -> ((r.getSeq[String](1), r.getSeq[Long](2))))
      .toMap
    val want = at.collect().map { r =>
      val attrs = r.getSeq[String](1).distinct.filter(_ != "0").sorted
      r.getLong(0) -> ((attrs, r.getSeq[Long](2)))
    }.toMap
    got.foreach { case (v, (attrs, adj)) =>
      assert((attrs, adj) === want(v), s"vertex $v")
    }
    assert(got.keySet === want.keySet)
  }

  test("multi_attr format: write -> read preserves weighted edges") {
    val w = sym.withColumn("weight",
        (pmod(col("src") + col("dst"), lit(5)) + 1).cast("double"))
      .withColumn("attrs", array(lit("m"), lit("x")))
      .select(col("src"), col("attrs"), col("dst"), col("weight"))
    val dir = tmp()
    GraphIO.writeMultiAttrAdj(w, s"$dir/g")
    val back = GraphIO.readMultiAttrEdges(spark, s"$dir/g")
    val want = w.collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
    val got = back.collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
    assert(got === want)
    // attrs ride through unmodified for this format
    assert(back.select(col("attrs")).distinct().collect()
      .map(_.getSeq[String](0)).toSet === Set(Seq("m", "x")))
  }

  test("sequentialPack: equals the single-threaded running-sum layout") {
    import spark.implicits._
    val docs = (0L until 97L).map(i => (i, s"doc $i " + ("w " * (i % 13).toInt)))
      .toDF("doc_id", "text")
    val n = graft.text.TextFunctions.tokenCount(col("text"))
    val got = TrainPrep.sequentialPack(spark, docs, "doc_id", n,
        capacity = 16, partitions = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    // reference: sequential scan in id order
    val counts = docs.select(col("doc_id"), n.as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val want = counts.map { case (id, nt) =>
      val s = acc; acc += nt; (id, nt, s / 16, s % 16)
    }
    assert(got.toSeq === want.toSeq)
    // multi-partition path actually exercised
    assert(docs.count() === 97)
  }

  test("sequentialPack: empty and single-row inputs") {
    import spark.implicits._
    val empty = TrainPrep.sequentialPack(spark,
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id",
      graft.text.TextFunctions.tokenCount(col("text")), capacity = 16)
    assert(empty.count() === 0)
    val one = TrainPrep.sequentialPack(spark,
      Seq((7L, "a b c")).toDF("doc_id", "text"), "doc_id",
      graft.text.TextFunctions.tokenCount(col("text")), capacity = 16)
      .collect()
    assert(one.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq === Seq((7L, 3L, 0L, 0L)))
  }

  test("hashSplit: deterministic, salt-sensitive, roughly 80/10/10") {
    import spark.implicits._
    val ids = (0L until 1000L).toDF("id")
    val a = ids.select(col("id"), TrainPrep.hashSplit("id", "s1").as("sp"))
      .groupBy("sp").count().collect().map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(a.values.sum === 1000L)
    assert(a("train") > 700 && a("train") < 900)
    assert(a("val") > 50 && a("val") < 160)
    assert(a("test") > 50 && a("test") < 160)
    // same salt = identical assignment; different salt = different
    val x = ids.select(TrainPrep.hashSplit("id", "s1").as("sp")).collect()
      .map(_.getString(0)).toSeq
    val y = ids.select(TrainPrep.hashSplit("id", "s1").as("sp")).collect()
      .map(_.getString(0)).toSeq
    val z = ids.select(TrainPrep.hashSplit("id", "other").as("sp")).collect()
      .map(_.getString(0)).toSeq
    assert(x === y)
    assert(x !== z)
  }

  test("systematicPpsSample: exactly k picks, heavy docs picked multiply") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // one heavy doc (weight > W/k) among light ones
    val docs = ((1L to 96L).map(i => (i, 1L + rnd.nextInt(9).toLong)) :+
      (97L, 400L)).toDF("doc_id", "w")
    val k = 10
    val got = TrainPrep.systematicPpsSample(spark, docs, "doc_id",
      col("w"), k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._4).sum === k.toLong, s"total picks must be $k")
    val w = docs.agg(org.apache.spark.sql.functions.sum("w")).head.getLong(0)
    val heavy = got.find(_._1 == 97L).get
    // weight 400 spans floor(400*k/W) or +1 positions
    assert(heavy._4 >= 400L * k / w && heavy._4 <= 400L * k / w + 1)
    // single-threaded replay: positions j*W div k inside [start, start+w)
    val rows = docs.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val expect = rows.map { case (id, wt) =>
      val s = acc; acc += wt
      val picks = (0 until k).count(j =>
        j.toLong * w / k >= s && j.toLong * w / k < s + wt)
      (id, wt, s, picks.toLong)
    }.filter(_._4 > 0)
    assert(got.sortBy(_._1).toSeq === expect.toSeq)
  }

  test("systematicPpsSample: zero-weight docs are never picked") {
    import spark.implicits._
    val docs = Seq((1L, 5L), (2L, 0L), (3L, 5L)).toDF("doc_id", "w")
    val got = TrainPrep.systematicPpsSample(spark, docs, "doc_id",
      col("w"), 4).collect().map(_.getLong(0)).toSet
    assert(!got.contains(2L))
  }
}
