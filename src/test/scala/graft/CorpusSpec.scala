package graft

import graft.corpus.{CorpusGen, EdgeDeriver}
import graft.graph.Edges
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** North-rule input shape + derivation invariants (FIXTURES.md §1-2):
  * deterministic generation, per-row content sha256 equality end-to-end
  * through a write/read round trip, vid collision-freedom, canonical
  * self-loop-free deduplicated edges, sorted adjacency.
  */
class CorpusSpec extends SparkSpec {

  private lazy val tinyCached = {
    val df = CorpusGen.corpus(spark, CorpusGen.Tiny).cache()
    df.count()
    df
  }

  test("corpus has the exact north-rule schema") {
    assert(tinyCached.schema.map(f => (f.name, f.dataType.typeName)) ===
      Seq("repo" -> "string", "path" -> "string", "commit" -> "string",
        "lang" -> "string", "content" -> "string"))
    assert(tinyCached.count() === CorpusGen.Tiny.rows)
  }

  test("generation is deterministic: regenerated sha256 multiset identical") {
    val a = CorpusGen.corpus(spark, CorpusGen.Tiny)
      .select(sha2(col("content"), 256)).collect().map(_.getString(0)).sorted
    val b = CorpusGen.corpus(spark, CorpusGen.Tiny)
      .select(sha2(col("content"), 256)).collect().map(_.getString(0)).sorted
    assert(a.sameElements(b))
  }

  test("per-row content sha256 survives the parquet round trip (input_hint invariant)") {
    val dir = Files.createTempDirectory("graft-corpus").toString + "/corpus"
    val written = tinyCached
      .withColumn("sha", sha2(col("content"), 256))
    written.write.mode("overwrite").parquet(dir)
    val read = spark.read.parquet(dir)
    // every re-read row's recomputed sha equals its written sha, and the
    // (repo,path,commit)->sha multiset matches the source exactly
    assert(read.filter(sha2(col("content"), 256) =!= col("sha")).count() === 0)
    val key = Seq("repo", "path", "commit", "sha")
    assert(read.groupBy(key.map(col): _*).count()
      .except(written.groupBy(key.map(col): _*).count()).count() === 0)
  }

  test("corpus plants skew: hub repo and hub commits exist") {
    val byRepo = tinyCached.groupBy("repo").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val hub = byRepo("org0/repo0").toDouble
    val meanRest = (byRepo.values.sum - hub) / (byRepo.size - 1)
    assert(hub > 1.5 * meanRest, "hub repo should dominate the mean of the rest")
  }

  test("vertices: stable 63-bit ids, collision-free, both kinds") {
    val v = EdgeDeriver.vertices(tinyCached).cache()
    assert(EdgeDeriver.collisionFree(v))
    assert(v.filter(col("vid") < 0).count() === 0)
    assert(v.select("kind").distinct().collect().map(_.getString(0)).sorted
      === Array("path", "repo"))
    v.unpersist()
  }

  test("edges: canonical src<dst, deduplicated, no self-loops, positive weight") {
    val e = EdgeDeriver.edges(tinyCached).cache()
    assert(e.count() > 0)
    assert(e.filter(col("src") >= col("dst")).count() === 0)
    assert(e.groupBy("src", "dst").count().filter(col("count") > 1).count() === 0)
    assert(e.filter(col("weight") < 1).count() === 0)
    e.unpersist()
  }

  test("adj: sorted neighbor arrays covering both endpoints") {
    val e = EdgeDeriver.edges(tinyCached)
    val a = EdgeDeriver.adj(e, partitions = 4).cache()
    assert(a.filter(col("adj") =!= sort_array(col("adj"))).count() === 0)
    // every vertex of the edge table appears exactly once
    val nv = Edges.vertexIds(Edges.symmetrize(e)).count()
    assert(a.count() === nv)
    a.unpersist()
  }

  test("derivation is deterministic end-to-end (edge multiset stable)") {
    val e1 = EdgeDeriver.edges(CorpusGen.corpus(spark, CorpusGen.Tiny))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val e2 = EdgeDeriver.edges(CorpusGen.corpus(spark, CorpusGen.Tiny))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(e1.sameElements(e2))
  }

  test("kernels run end-to-end on the derived corpus graph") {
    val e = EdgeDeriver.edges(tinyCached, minWeight = 2L)
      .select(col("src"), col("dst"))
    val es = e.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val cc = graft.kernels.ConnectedComponents
      .run(spark, Edges.symmetrize(e)).components
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Oracles.connectedComponents(es))
    assert(graft.kernels.TriangleCount.total(e).head().getLong(0)
      === Oracles.triangleCount(es))
  }
}
