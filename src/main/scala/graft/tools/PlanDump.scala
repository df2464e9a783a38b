package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` of SparkEntry queries to files —
  * the evidence artifacts committed under plans/r0N/.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix>
  *        <queryName>[,<queryName>...]
  *
  * Writes <outDir>/<queryName>_<suffix>.txt for each query. The plan is
  * captured BEFORE execution (AdaptiveSparkPlan isFinalPlan=false), which
  * is the deterministic, environment-independent shape a reviewer can
  * check against the code.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args(3).split(",").toSeq
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val localDir = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
      "/dev/shm/graft-spark-local")
    new java.io.File(localDir).mkdirs()
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.local.dir", localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      println(s"[plandump] wrote $name ($suffix)")
    }
    spark.stop()
  }
}
