package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Tables

/** Interleaved A/B for the grouping-lattice scan stages (r17):
  *  A: r16 shipped — rollup straight off the lineitem scan;
  *  B: project 3 columns + Tables.balanced before the rollup.
  * Also times the agg_groupby (Q1) shape both ways.
  * Usage: RollupAb <sfDir> [rounds]
  */
object RollupAb {
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
    def dec2(c: Column) = c.cast(DecimalType(18, 2))

    def rollup(bal: Boolean): DataFrame = {
      val base0 = Tables.lineitem(spark, dir)
        .select(col("l_returnflag"), col("l_linestatus"), col("l_extendedprice"))
      val base = if (bal) Tables.balanced(base0) else base0
      base.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(dec2(col("l_extendedprice"))).cast(DoubleType).as("sum_price"),
          count(lit(1)).as("n_items"))
    }
    def q1(bal: Boolean): DataFrame = {
      val base0 = Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") <= lit("2001-09-02 00:00:00").cast(TimestampType))
        .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
      val base = if (bal) Tables.balanced(base0) else base0
      base.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec2(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
          sum(dec2(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
          sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
            .cast(DoubleType).as("sum_disc_price"),
          sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))
            * (lit(1) + dec2(col("l_tax")))).cast(DoubleType).as("sum_charge"),
          count(lit(1)).as("count_order"))
    }
    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for ((nm, mk) <- Seq(
        "rollup" -> rollup _,
        "q1    " -> q1 _)) {
      time(() => mk(false)); time(() => mk(true))
      val as = collection.mutable.ArrayBuffer[Double]()
      val bs = collection.mutable.ArrayBuffer[Double]()
      for (_ <- 1 to n) { as += time(() => mk(false)); bs += time(() => mk(true)) }
      println(f"[ab] $nm A raw  min ${as.min}%.2f  ${as.map(t => f"$t%.2f").mkString(" ")}")
      println(f"[ab] $nm B bal  min ${bs.min}%.2f  ${bs.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
