package graft.tools
import graft.text.{NaiveBayes, TextFunctions => TF}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object NbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val localDir = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
      "/dev/shm/graft-spark-local")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[nbprobe] $name ${(System.nanoTime-t0)/1e9}%.2f s"); a
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // warm the scan
    t("scan")(docs.count())
    val label = (col("n_chars") % 2L === 0L).cast("long")
    val toks = t("toks-ckpt")(docs.select(col("doc_id").as("id"), label.as("y"),
        explode(TF.tokens(col("text"))).as("tok"))
      .localCheckpoint(eager = true))
    val tot = toks.groupBy(col("y")).agg(
      count(lit(1)).as("t"), countDistinct(col("id")).as("n"))
    t("tot-head")(tot.collect())
    t("v-count")(toks.select(col("tok")).distinct().count())
    val w = toks.groupBy(col("tok")).agg(
        sum(when(col("y") === 1L, 1L).otherwise(0L)).as("c1"),
        sum(when(col("y") === 0L, 1L).otherwise(0L)).as("c0"))
    val sc = toks.join(w, "tok").groupBy(col("id"), col("y"))
      .agg(sum(col("c1")).as("score"))
    t("score-agg")(sc.groupBy(col("score")).agg(count(lit(1))).count())
    t("full-calibration")(NaiveBayes.calibration(docs, "doc_id", "text",
      label).count())
    t("full-calibration-2nd")(NaiveBayes.calibration(docs, "doc_id", "text",
      label).count())
    spark.stop()
  }
}
