package graft.tools
import graft.text.{TextFunctions => TF}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object LooProbe {
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
      println(f"[looprobe] $name ${(System.nanoTime-t0)/1e9}%.2f s"); a
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    t("scan")(docs.count())
    val tcol = TF.tokens(col("text"))
    val theCntHof = size(filter(tcol, x => x === "the")).cast("long")
    val theCnt = (size(tcol) - size(array_remove(tcol, "the"))).cast("long")
    val label = (theCnt * 20L >= TF.tokenCount(col("text"))).cast("long")
    val labelHof = (theCntHof * 20L >= TF.tokenCount(col("text"))).cast("long")
    for (r <- 1 to 2) {
      t(s"toks-ckpt-hof-$r")(docs.select(col("doc_id").as("id"),
          col("source").as("dsrc"), labelHof.as("y"),
          explode(TF.tokens(col("text"))).as("tok"))
        .localCheckpoint(eager = true).unpersist())
      t(s"toks-ckpt-rem-$r")(docs.select(col("doc_id").as("id"),
          col("source").as("dsrc"), label.as("y"),
          explode(TF.tokens(col("text"))).as("tok"))
        .localCheckpoint(eager = true).unpersist())
    }
    val toks = t("toks-ckpt")(docs.select(col("doc_id").as("id"),
        col("source").as("dsrc"), label.as("y"),
        explode(TF.tokens(col("text"))).as("tok"))
      .localCheckpoint(eager = true))
    val tot = toks.groupBy(col("y")).agg(
      count(lit(1)).as("t"), countDistinct(col("id")).as("n"))
    t("tot")(tot.collect())
    t("v")(toks.select(col("tok")).distinct().count())
    val srcTot = toks.groupBy(col("dsrc").as("hsrc")).agg(count(lit(1)))
    t("srcTot")(srcTot.collect())
    val pres = toks.select(col("tok"), col("dsrc")).distinct()
    val excl = pres.join(
        pres.groupBy(col("tok")).agg(count(lit(1)).as("ns")), "tok")
      .filter(col("ns") === 1L)
      .groupBy(col("dsrc")).agg(count(lit(1)).as("vx"))
    t("excl")(excl.collect())
    val cnt = toks.groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val cntS = toks.groupBy(col("tok"), col("dsrc").as("hsrc"))
      .agg(count(lit(1)).as("c1s"))
    val w = cnt.crossJoin(broadcast(srcTot.select(col("hsrc"))))
      .join(cntS, Seq("tok", "hsrc"), "left")
      .select(col("tok"), col("hsrc"),
        coalesce(col("c1s"), lit(0L)).as("w"))
    t("w-count")(w.count())
    val sc = toks.join(w, "tok")
      .filter(col("dsrc") =!= col("hsrc"))
      .groupBy(col("id"), col("y"), col("hsrc"))
      .agg(sum(col("w")).as("score"))
      .groupBy(col("hsrc"), col("y"), (col("score") > 0L).as("pred"))
      .agg(count(lit(1)).as("n"))
    t("score")(sc.collect())
    t("full-q254")(graft.SparkEntry.queries("q254_loo_source_value")(spark, sfDir).count())
    spark.stop()
  }
}
