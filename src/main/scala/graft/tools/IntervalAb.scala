package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Interleaved A/B for interval_overlap_join's island-checkpoint spread
  * (r17): A = ckpt as AQE leaves it (~2 partitions at sf0.1); B = ckpt
  * repartitioned to core count. Usage: IntervalAb <sfDir> [rounds]
  */
object IntervalAb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val n = if (args.length > 1) args(1).toInt else 5

    def op(spread: Boolean): DataFrame = {
      val w = Window.partitionBy(col("user_id")).orderBy(col("s"), col("event_id"))
      val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val iv0 = Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("s"))
        .withColumn("e", col("s") + 300L * 1000000L)
        .withColumn("prev_end", max(col("e")).over(wPrev))
        .withColumn("new_island",
          when(col("prev_end").isNotNull && col("prev_end") >= col("s"), 0L)
            .otherwise(1L))
        .withColumn("island", sum(col("new_island")).over(wRun))
        .groupBy(col("user_id"), col("island"))
        .agg(min(col("s")).as("i_start"), max(col("e")).as("i_end"))
      val iv = Tables.ckpt(
        if (spread) iv0.repartition(spark.sparkContext.defaultParallelism) else iv0)
      val W = 3600L * 1000000L
      val bucketed = iv.select(col("user_id"), col("i_start"), col("i_end"),
        explode(expr(s"sequence(i_start div $W, i_end div $W)")).as("bucket"))
      val x = bucketed.alias("x")
      val y = bucketed.alias("y")
      x.join(y,
          col("x.bucket") === col("y.bucket") &&
            col("x.user_id") < col("y.user_id"))
        .select(col("x.bucket").as("bucket"),
          col("x.user_id").as("user_a"), col("x.i_start").as("sa"),
          col("x.i_end").as("ea"),
          col("y.user_id").as("user_b"), col("y.i_start").as("sb"),
          col("y.i_end").as("eb"))
        .filter(col("bucket") === expr(s"greatest(sa div $W, sb div $W)"))
        .filter(col("sa") < col("eb") && col("sb") < col("ea"))
        .groupBy(col("user_a"), col("user_b"))
        .agg(count(lit(1)).as("n_overlaps"),
          expr("sum(least(ea, eb) - greatest(sa, sb)) div 1000000")
            .as("overlap_sec"))
    }
    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(() => op(false)); time(() => op(true))
    val as = collection.mutable.ArrayBuffer[Double]()
    val bs = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to n) { as += time(() => op(false)); bs += time(() => op(true)) }
    println(f"[ab] A asis    min ${as.min}%.2f  ${as.map(t => f"$t%.2f").mkString(" ")}")
    println(f"[ab] B spread  min ${bs.min}%.2f  ${bs.map(t => f"$t%.2f").mkString(" ")}")
    spark.stop()
  }
}
