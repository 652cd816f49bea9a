package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool: write `explain("formatted")` output for registered queries to
  * files — the optimization-round evidence format (`plans/r<N>/<q>_{before,
  * after}.txt`). Complements [[PlanDump]] (which prints the EXECUTED
  * post-AQE plan to stdout): the formatted pre-execution plan is where
  * PushedFilters / ReadSchema / Exchange placement / join strategy read
  * best, and is what the optimization guide (§7.2) asks to capture.
  *
  * Usage: runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> <query...>
  * Writes <outDir>/<query>_<suffix>.txt per query.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, queries @ _*) = args.toSeq.toArray: @unchecked
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    queries.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      println(s"[explain] wrote $outDir/${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
