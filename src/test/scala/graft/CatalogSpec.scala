package graft

import graft.catalog.{Cdc, LocalCatalog}
import java.nio.file.Files

/** Catalog seam: atomic snapshot commits, append-as-new-snapshot,
  * read-latest, time travel.
  */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  test("createOrReplace / append / read-latest / time travel") {
    val cat = new LocalCatalog(
      Files.createTempDirectory("graft-catalog").toString)
    val s1 = cat.createOrReplace("t", Seq(1L, 2L).toDF("x"))
    val s2 = cat.append("t", Seq(3L).toDF("x"))
    assert(cat.snapshots("t") === Seq(s1, s2))
    assert(cat.read(spark, "t").collect().map(_.getLong(0)).sorted
      === Array(1L, 2L, 3L))
    assert(cat.readSnapshot(spark, "t", s1).collect().map(_.getLong(0)).sorted
      === Array(1L, 2L))
    // replace starts a fresh lineage
    val s3 = cat.createOrReplace("t", Seq(9L).toDF("x"))
    assert(cat.read(spark, "t").collect().map(_.getLong(0)) === Array(9L))
    assert(cat.readSnapshot(spark, "t", s2).collect()
      .map(_.getLong(0)).sorted === Array(1L, 2L, 3L))
    assert(s3 > s2)
  }

  test("expire snapshots: history pruned, content intact, parents kept") {
    val cat = new LocalCatalog(
      Files.createTempDirectory("graft-catalog-exp").toString)
    val s1 = cat.createOrReplace("t", Seq(1L).toDF("x"))
    val s2 = cat.append("t", Seq(2L).toDF("x"))
    val s3 = cat.createOrReplace("t", Seq(9L, 10L).toDF("x"))
    assert(cat.expireSnapshots("t", keep = 1) === Seq(s1, s2))
    assert(cat.snapshots("t") === Seq(s3))
    assert(cat.read(spark, "t").collect().map(_.getLong(0)).sorted
      === Array(9L, 10L))
    // time travel to an expired snapshot now fails (files deleted)
    intercept[Exception](cat.readSnapshot(spark, "t", s1).collect())
    // reachability: keep=1 on an append chain retains the parents a
    // kept snapshot still reads through — nothing expires
    val c2 = new LocalCatalog(
      Files.createTempDirectory("graft-catalog-exp2").toString)
    c2.createOrReplace("u", Seq(1L).toDF("x"))
    c2.append("u", Seq(2L).toDF("x"))
    assert(c2.expireSnapshots("u", keep = 1) === Seq.empty)
    assert(c2.read(spark, "u").collect().map(_.getLong(0)).sorted
      === Array(1L, 2L))
  }

  test("schema evolution: appended column widens reads, back-fills null") {
    val cat = new LocalCatalog(
      Files.createTempDirectory("graft-catalog-evo").toString)
    val s1 = cat.createOrReplace("t", Seq((1L, "a"), (2L, "b"))
      .toDF("id", "lang"))
    cat.append("t", Seq((3L, "c", 42L)).toDF("id", "lang", "quality"))
    val latest = cat.read(spark, "t")
    assert(latest.columns.sorted === Array("id", "lang", "quality"))
    val byId = latest.collect()
      .map(r => r.getLong(r.fieldIndex("id")) ->
        (if (r.isNullAt(r.fieldIndex("quality"))) None
         else Some(r.getLong(r.fieldIndex("quality"))))).toMap
    assert(byId === Map(1L -> None, 2L -> None, 3L -> Some(42L)))
    // the pre-evolution snapshot still reads with its original schema
    assert(cat.readSnapshot(spark, "t", s1).columns.sorted
      === Array("id", "lang"))
  }

  test("append after replace keeps the fresh lineage (no resurrection)") {
    val cat = new LocalCatalog(
      Files.createTempDirectory("graft-catalog3").toString)
    cat.createOrReplace("t", Seq(1L, 2L).toDF("x"))
    cat.append("t", Seq(3L).toDF("x"))
    cat.createOrReplace("t", Seq(10L).toDF("x"))
    val s4 = cat.append("t", Seq(11L).toDF("x"))
    // round-1 bug: append recorded ALL prior snapshots as parents, so this
    // read resurrected 1,2,3 from before the replace
    assert(cat.read(spark, "t").collect().map(_.getLong(0)).sorted
      === Array(10L, 11L))
    val s5 = cat.append("t", Seq(12L).toDF("x"))
    assert(cat.readSnapshot(spark, "t", s5).collect()
      .map(_.getLong(0)).sorted === Array(10L, 11L, 12L))
    assert(cat.readSnapshot(spark, "t", s4).collect()
      .map(_.getLong(0)).sorted === Array(10L, 11L))
  }

  test("deletion replay: drill-down recompute on a deleted-vertex snapshot") {
    import graft.graph.Edges
    import org.apache.spark.sql.functions.col
    val cat = new LocalCatalog(
      Files.createTempDirectory("graft-catalog4").toString)
    val sym = Edges.symmetrize(
      Oracles.sample15.toDF("src", "dst"))
    val s1 = cat.createOrReplace("edges", sym)
    // drill-down: remove vertex 3 (an articulation point of sample15),
    // commit as a new snapshot, recompute CC on it — the reference demo's
    // resume-with-removed-nodes semantics at the table layer
    cat.deleteWhere(spark, "edges", col("src") === 3 || col("dst") === 3)
    val replayed = graft.kernels.ConnectedComponents
      .run(spark, cat.read(spark, "edges")).components
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val direct = graft.kernels.ConnectedComponents
      .run(spark, sym.filter(col("src") =!= 3 && col("dst") =!= 3))
      .components.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(replayed === direct)
    assert(!replayed.contains(3L))
    // the pre-delete graph is still time-travelable
    assert(cat.readSnapshot(spark, "edges", s1).count() === sym.count())
  }

  test("incremental edge derivation over appended corpus snapshots") {
    import graft.corpus.{CorpusGen, EdgeDeriver}
    val cat = new LocalCatalog(
      Files.createTempDirectory("graft-catalog2").toString)
    val full = CorpusGen.corpus(spark, CorpusGen.Tiny)
    val half1 = full.limit(100)
    cat.createOrReplace("corpus", half1)
    cat.append("corpus", full.exceptAll(half1))
    // derivation over the appended table == derivation over the full table
    val viaCatalog = EdgeDeriver.edges(cat.read(spark, "corpus"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val direct = EdgeDeriver.edges(full)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(viaCatalog.sameElements(direct))
  }

  test("deleteWhere keeps rows where the predicate is NULL (SQL DELETE)") {
    import org.apache.spark.sql.functions.col
    val cat = new LocalCatalog(
      Files.createTempDirectory("graft-catalog5").toString)
    cat.createOrReplace("t",
      Seq((1L, Option(9L)), (2L, Option.empty[Long]), (3L, Option(2L)))
        .toDF("id", "x"))
    cat.deleteWhere(spark, "t", col("x") > 5)
    // id 1 deleted (9 > 5 true); id 2 KEPT (NULL predicate); id 3 kept
    assert(cat.read(spark, "t").collect().map(_.getLong(0)).sorted
      === Array(2L, 3L))
  }

  test("compact: content identical, time travel intact, parents pruned") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-compact")
    val cat = new LocalCatalog(root.toString)
    cat.createOrReplace("t", Seq(1L, 2L).toDF("id"))
    cat.append("t", Seq(3L).toDF("id"))
    cat.append("t", Seq(4L).toDF("id"))
    val before = cat.read(spark, "t").collect().map(_.getLong(0)).sorted
    val snapPre = cat.snapshots("t").max
    cat.compact(spark, "t", files = 1)
    val after = cat.read(spark, "t").collect().map(_.getLong(0)).sorted
    assert(after === before)
    // compacted snapshot reads from its own files only (no parent chain)
    // and the pre-compaction snapshot is still time-travelable
    assert(cat.snapshots("t").max > snapPre)
    assert(cat.readSnapshot(spark, "t", snapPre)
      .collect().map(_.getLong(0)).sorted === before)
  }

  test("merge: matched keys update, new keys insert, history intact") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-merge").toString
    val cat = new LocalCatalog(root)
    val s0 = cat.createOrReplace("t",
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    cat.merge(spark, "t", Seq((2L, "B"), (9L, "i")).toDF("k", "v"), "k")
    val latest = cat.read(spark, "t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(latest == Map(1L -> "a", 2L -> "B", 3L -> "c", 9L -> "i"))
    // pre-merge snapshot unchanged
    val old = cat.readSnapshot(spark, "t", s0).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(old == Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("cdc rowDiff: insert/delete/update classified, unchanged silent") {
    import spark.implicits._
    val before = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "v", "n")
    val after = Seq((1L, "a", 10L), (2L, "B", 20L), (4L, "d", 40L))
      .toDF("k", "v", "n")
    val got = Cdc.rowDiff(before, after, "k", Seq("v", "n")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "update", 3L -> "delete", 4L -> "insert"))
  }
}
