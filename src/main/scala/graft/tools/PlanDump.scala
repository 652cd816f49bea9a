package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the EXECUTED (post-AQE) plan of registered queries.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <queryName> [queryName ...]
  * The plan-shape truths this prints are pinned by PlanSpec; this main is
  * for eyeballing a plan while iterating on an operator.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.count() // materialize so AQE finalizes every stage
      println(s"=== $name ===")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
