package graft.tools

import org.apache.spark.sql.SparkSession

/** Load-robust multi-query timer (builder-side tooling): warm pass for
  * every named query, then ROUND-ROBIN timed passes — q1..qn, q1..qn, … —
  * so each query's samples are spread across the box's ~5-minute tenant
  * load cycle, and the per-query MIN approximates the quiet-window cost.
  * (Back-to-back samples, TimeQ-style, land a whole query inside one load
  * spike; the r17 sweeps measured 2-6× inflation that way.)
  * Usage: TimeQMin <sfDir> <rounds> <query...>
  */
object TimeQMin {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def pass(q: String): Double = {
      val t0 = System.nanoTime
      graft.SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime - t0) / 1e9
    }
    names.foreach(pass) // warm
    val samples = names.map(_ -> collection.mutable.ArrayBuffer[Double]()).toMap
    for (_ <- 1 to rounds; q <- names) samples(q) += pass(q)
    names.foreach { q =>
      val s = samples(q)
      println(f"[min] $q%-24s min ${s.min}%6.2f  samples ${s.map(x => f"$x%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
