package graft

import graft.graph.Edges
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persistent co-location via bucketed tables — the production layout for
  * the 100 TB edge table: bucketBy(src) at write time means EVERY later
  * superstep join reads pre-partitioned buckets and only the (small)
  * state side is exchanged; the |E|-row shuffle disappears from every job
  * instead of being paid once per session (`repartition` co-location, the
  * in-session equivalent the kernels use, dies with the session).
  */
class BucketSpec extends SparkSpec {

  private def superstep(edges: DataFrame, state: DataFrame): DataFrame =
    edges.join(state.hint("SHUFFLE_HASH"), edges("src") === state("vid"))
      .groupBy(edges("dst").as("vid"))
      .agg(min(col("component")).as("m"))

  private def exchanges(df: DataFrame): Int = {
    df.collect()
    df.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange"))
  }

  test("bucketed edge table: superstep join never re-shuffles the edge side") {
    val sym = Edges.symmetrize(edgeDF(Oracles.powerLaw(200, seed = 13)))
    spark.sql("DROP TABLE IF EXISTS edges_bucketed")
    sym.write.bucketBy(4, "src").sortBy("src")
      .mode("overwrite").saveAsTable("edges_bucketed")
    val bucketed = spark.table("edges_bucketed")
    val plain = sym // same data, no layout

    val state = Edges.vertexIds(sym)
      .select(col("vid"), col("vid").as("component"))

    val viaBuckets = superstep(bucketed, state)
    val viaPlain = superstep(plain, state)

    // identical results...
    val a = viaBuckets.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = viaPlain.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)

    // ...but the bucketed plan exchanges ONLY the state side: one less
    // shuffle than the plain plan, and no Exchange feeds the file scan
    val nb = exchanges(viaBuckets)
    val np = exchanges(viaPlain)
    assert(nb < np, s"bucketed=$nb plain=$np")
    val scanSide = viaBuckets.queryExecution.executedPlan.toString()
    assert(scanSide.contains("Bucketed: true"),
      "edge scan should be bucketed:\n" + scanSide)
    spark.sql("DROP TABLE IF EXISTS edges_bucketed")
  }
}
