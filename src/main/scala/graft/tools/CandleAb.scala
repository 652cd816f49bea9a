package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Tables

/** Interleaved A/B for the r17 candle-base changes, measured on mfi_14's
  * full shape (14-lag typical-price money-flow — a representative heavy
  * bySym window consumer):
  *  A: r16 shipped — raw events scan (1 split) into the candle agg, bySym
  *     window on the AQE-coalesced single partition;
  *  B: balanced(events) before the JSON parse + explicit
  *     repartition(cores, symbol) under the windows.
  * Usage: CandleAb <sfDir> [rounds]
  */
object CandleAb {
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

    def closes(balanced: Boolean): DataFrame = {
      val ev0 = Tables.events(spark, dir)
      val ev = if (balanced) Tables.balanced(ev0) else ev0
      val base = ev.select(
        col("ts"), col("event_type").as("symbol"),
        col("value").cast(DecimalType(18, 2)).as("price"),
        get_json_object(col("props"), "$.k").cast(DecimalType(18, 0)).as("quantity"))
        .groupBy(date_trunc("minute", col("ts")).as("window_start"), col("symbol"))
        .agg(max(col("price")).cast(DoubleType).as("high_price"),
          min(col("price")).cast(DoubleType).as("low_price"),
          expr("max_by(price, ts)").cast(DoubleType).as("close_price"),
          sum(col("quantity")).cast(DoubleType).as("total_volume"))
        .select(col("symbol"), col("window_start"),
          round(col("close_price") * 100).cast(LongType).as("x"),
          round(col("high_price") * 100).cast(LongType).as("hi"),
          round(col("low_price") * 100).cast(LongType).as("lo"),
          round(col("total_volume")).cast(LongType).as("vol"))
      if (balanced)
        base.repartition(spark.sparkContext.defaultParallelism, col("symbol"))
      else base
    }
    def mfi(balanced: Boolean): DataFrame = {
      val bySym = Window.partitionBy(col("symbol")).orderBy(col("window_start"))
      val w14 = bySym.rowsBetween(-13, 0)
      closes(balanced)
        .withColumn("tp3", col("hi") + col("lo") + col("x"))
        .withColumn("prev", lag(col("tp3"), 1).over(bySym))
        .filter(col("prev").isNotNull)
        .withColumn("pmf", when(col("tp3") > col("prev"), col("tp3") * col("vol")).otherwise(lit(0L)))
        .withColumn("nmf", when(col("tp3") < col("prev"), col("tp3") * col("vol")).otherwise(lit(0L)))
        .withColumn("ps", sum(col("pmf")).over(w14))
        .withColumn("ns", sum(col("nmf")).over(w14))
        .withColumn("nw", count(lit(1)).over(w14))
        .filter(col("nw") === 14)
        .select(col("symbol"), col("window_start"),
          when(col("ps") + col("ns") =!= 0,
            col("ps").cast(DoubleType) * 100.0 / (col("ps") + col("ns")).cast(DoubleType)).as("mfi"))
    }
    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(() => mfi(false)); time(() => mfi(true))
    val as = collection.mutable.ArrayBuffer[Double]()
    val bs = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to n) { as += time(() => mfi(false)); bs += time(() => mfi(true)) }
    println(f"[ab] A raw       min ${as.min}%.2f  ${as.map(t => f"$t%.2f").mkString(" ")}")
    println(f"[ab] B bal+part  min ${bs.min}%.2f  ${bs.map(t => f"$t%.2f").mkString(" ")}")
    spark.stop()
  }
}
