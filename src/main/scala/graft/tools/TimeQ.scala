package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer (builder-side tooling): warm pass + timed
  * noop-sink pass per named query, same harness shape as [[graft.Bench]].
  * Usage: TimeQ <sfDir> <query...>
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { q =>
      graft.SparkEntry.queries(q)(spark, args(0)).write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime
      graft.SparkEntry.queries(q)(spark, args(0)).write.format("noop").mode("overwrite").save()
      println(f"$q%-24s ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
