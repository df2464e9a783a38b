package graft.tools
import graft.graph.Edges
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object CoocProbe {
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
      println(f"[coocprobe] $name ${(System.nanoTime-t0)/1e9}%.2f s"); a
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    t("scan")(li.count())
    def cooc = Edges.coOccurrence(li, "l_orderkey", "l_partkey")
    t("cooc-1")(cooc.count())
    t("cooc-2")(cooc.count())
    t("e2-sym-degrees")(Edges.degrees(Edges.symmetrize(
      cooc.filter(col("weight") >= 2).select(col("src"), col("dst")))).count())
    spark.stop()
  }
}
