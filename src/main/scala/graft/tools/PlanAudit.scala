package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution

/** Physical-plan audit: for each SparkEntry query, check the properties
  * that matter at 100 TB — column pruning reaching the parquet scan,
  * filters pushed down, broadcast joins where a side is dimension-sized,
  * and whole-stage codegen coverage. Prints one line per query plus the
  * full formatted plan for any query that fails a check.
  *
  * Usage: sbt "runMain graft.tools.PlanAudit [sfDir] [queryPrefix]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val prefix = args.drop(1).headOption.getOrElse("")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // queries whose scan should NOT read every column of its widest table
    val pruned = Set("q01", "q02", "q05", "q10", "q15", "q18", "q22")

    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.startsWith(prefix)).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.collect() // execute THIS QueryExecution so AQE finalizes it
        val qe: QueryExecution = df.queryExecution
        val physical = qe.executedPlan.toString()
        val scans = physical.linesIterator
          .filter(_.contains("ReadSchema")).toSeq
        val wideScan = scans.exists(l =>
          l.contains("l_comment") || l.contains("o_comment"))
        val codegen = physical.contains("WholeStageCodegen") || physical.contains("*(")
        val broadcasts = physical.linesIterator
          .count(_.contains("BroadcastHashJoin"))
        val flags = Seq(
          if (codegen) "" else "NO-CODEGEN",
          if (pruned(name.take(3)) && wideScan) "UNPRUNED-SCAN" else "")
          .filter(_.nonEmpty)
        println(f"$name%-22s scans=${scans.size}%2d bhj=$broadcasts%2d ${if (flags.isEmpty) "ok" else flags.mkString(",")}")
        if (flags.nonEmpty) println(qe.explainString(
          org.apache.spark.sql.execution.SimpleMode))
      } catch {
        case e: Throwable => println(f"$name%-22s ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
