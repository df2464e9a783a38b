package graft.tools

import graft.text.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: stage-level timing of the containment pipeline. */
object SegProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.local.dir", sys.env.getOrElse(
        "SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark-local"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SEG $label rows=$n sec=${(System.nanoTime - t0) / 1e9}%.1f")
    }
    val sh = Dedup.shingles(docs, "doc_id", "text", 3).persist()
    t("shingles")(sh.count())
    val sigs = Dedup.minHashSignatures(sh, 16, Dedup.shaSeededHash60)
    t("sigs")(sigs.count())
    val sets = sh.groupBy(col("id"))
      .agg(sort_array(collect_list(col("g"))).as("gs"),
        count(lit(1)).as("n")).persist()
    t("sets")(sets.count())
    val cands = Dedup.bandedCandidates(sigs, 4, 4, Int.MaxValue)
      .select(col("d1"), col("d2")).persist()
    t("cands")(cands.count())
    val bj = cands
      .join(broadcast(sets.select(col("id").as("d1"), col("gs").as("g1"),
        col("n").as("n1"))), "d1")
      .join(broadcast(sets.select(col("id").as("d2"), col("gs").as("g2"),
        col("n").as("n2"))), "d2")
      .select(size(array_intersect(col("g1"), col("g2"))).cast("long").as("i"))
    t("bcast_intersect")(bj.filter(col("i") >= 0L).count())
    t("full")(Dedup.containmentLsh(docs, "doc_id", "text", 3, 16, 4,
      800000L, Int.MaxValue, Dedup.shaSeededHash60).count())
    spark.stop()
  }
}
