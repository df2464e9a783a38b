package graft.tools
import graft.sim.Ann
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object AnnProbe {
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
      println(f"[annprobe] $name ${(System.nanoTime-t0)/1e9}%.2f s"); a
    }
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    t("scan")(emb.count())
    val m = classOf[Ann.type]
    // phase 1: centroids (driver Lloyd loop)
    t("centroids") {
      val meth = Ann.getClass.getDeclaredMethods
        .find(_.getName == "kmeansCentroids").get
      meth.setAccessible(true)
      meth.invoke(Ann, emb, "vec_id", "embedding",
        Int.box(16), Int.box(3))
    }
    t("ivf-full")(Ann.ivfTopK(emb, "vec_id", "embedding", k = 5).count())
    t("ivf-full-2nd")(Ann.ivfTopK(emb, "vec_id", "embedding", k = 5).count())
    spark.stop()
  }
}
