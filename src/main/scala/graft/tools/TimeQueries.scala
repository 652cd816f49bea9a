package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing: `runMain graft.tools.TimeQueries <sfDir> <n> q1 q2 ...`
  * — warm pass then n timed passes per query, prints each sample. Builder-side
  * profiling aid; the driver contract bench is [[graft.Bench]].
  *
  * Timing drives a NOOP WRITE, not `count()`: count prunes every projected
  * expression it doesn't need, so map-only operators would be timed as
  * bare scans (the exact gotcha recorded in the verify skill). The noop
  * sink evaluates the full output of the plan.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val names = args.drop(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String): Unit =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    names.foreach { name =>
      run(name) // warm
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        run(name)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $name%-22s ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
