package graft.tools

import graft.sim.Ann
import graft.text.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure approximate-operator recall against the exact
  * baselines over a parameter grid — the evidence behind the LSH defaults
  * (`Ann.lshTopK` bands/bits, `Dedup.minHashLsh` bands) and the
  * recall columns reported by q26/q29.
  *
  * Usage: runMain graft.tools.RecallProbe [sfDir]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val brute = Ann.bruteTopK(emb, "vec_id", "embedding", 5)
      .select(col("vec_id"), col("nn_id")).persist()
    val nTrue = brute.count()
    for ((b, w) <- Seq((8, 8), (16, 4), (32, 4), (16, 6), (24, 5), (32, 6))) {
      val t0 = System.nanoTime
      val lsh = Ann.lshTopK(emb, "vec_id", "embedding", 5, 64, b, w)
        .select(col("vec_id"), col("nn_id")).persist()
      val caught = brute.join(lsh, Seq("vec_id", "nn_id"), "left_semi").count()
      val n = lsh.count(); lsh.unpersist()
      println(f"RECALL ann bands=$b bits=$w recall=${caught.toDouble / nTrue}%.3f rows=$n sec=${(System.nanoTime - t0) / 1e9}%.1f")
    }

    for ((nl, np) <- Seq((8, 2), (8, 4), (16, 4), (16, 8), (32, 8), (32, 12))) {
      val t0 = System.nanoTime
      val ivf = Ann.ivfTopK(emb, "vec_id", "embedding", 5, nl, np)
        .select(col("vec_id"), col("nn_id")).persist()
      val caught = brute.join(ivf, Seq("vec_id", "nn_id"), "left_semi").count()
      val n = ivf.count(); ivf.unpersist()
      println(f"RECALL ivf nlist=$nl nprobe=$np recall=${caught.toDouble / nTrue}%.3f rows=$n sec=${(System.nanoTime - t0) / 1e9}%.1f")
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val exact = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.7)
      .select(col("d1"), col("d2")).persist()
    val nPairs = exact.count()
    for (bands <- Seq(8, 16, 32)) {
      val t0 = System.nanoTime
      val cands = Dedup.minHashLsh(docs, "doc_id", "text",
          k = 3, numHashes = 64, bands = bands, threshold = 0.0)
        .select(col("d1"), col("d2")).persist()
      val caught = exact.join(cands, Seq("d1", "d2"), "left_semi").count()
      val n = cands.count(); cands.unpersist()
      println(f"RECALL minhash bands=$bands recall=${caught.toDouble / nPairs}%.3f cands=$n sec=${(System.nanoTime - t0) / 1e9}%.1f")
    }
    spark.stop()
  }
}
