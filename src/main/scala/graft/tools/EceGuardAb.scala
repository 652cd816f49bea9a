package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Tables

/** Throwaway A/B probe for ece_eval's int64-boundary guard shape (r15):
  * variant A carries the assert on the gap output column via `when`
  * (the r14 shipped form — prunable by a downstream projection, the
  * ADVICE finding), variant B applies it as a Filter stage (the r15
  * shipped form). Interleaved timed passes in ONE JVM so box drift
  * cancels — run after two loaded bench runs showed ece_eval medians
  * 2x its r14 quiet value while its input op calibration_bins barely
  * moved, to decide whether the Filter costs anything real.
  *
  * DELIBERATELY a frozen inline snapshot of the two guard shapes, not a
  * call into StatsOps.eceEval (a variant flag in production code would
  * be a measurement knob). Usage: EceGuardAb <sfDir> [n]
  */
object EceGuardAb {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: EceGuardAb <sfDir> [n]")
      sys.exit(2)
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val n = if (args.length > 1) args(1).toInt else 5

    def binned(): DataFrame = {
      val e = Tables.events(spark, dir)
        .filter(col("value").isNotNull)
        .select((col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("vc"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      val mx = e.agg(max(col("vc")).as("mxc"))
      e.crossJoin(broadcast(mx))
        .withColumn("bin", least(lit(9L), expr("vc * 10 div mxc")))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_b"), sum(col("pos")).as("pos_b"),
          sum(col("vc")).as("sum_vc"), min(col("mxc")).as("mxc"))
    }
    val gapDec = abs(col("pos_b").cast(DecimalType(19, 0)) * col("mxc")
      - col("sum_vc"))
    val gapGuard = assert_true(
      col("gap_dec") <= lit(Long.MaxValue),
      lit("ece ab probe: gap exceeds int64"))
    def finish(df: DataFrame): DataFrame = df
      .agg(sum(col("n_b")).as("n"), min(col("mxc")).as("mxc"),
        count(lit(1)).as("n_bins"), sum(col("gap")).as("ece_num"))
      .select(col("n"), col("mxc"), col("n_bins"), col("ece_num"),
        (col("ece_num").cast(DoubleType) /
          (col("n").cast(DoubleType) * col("mxc").cast(DoubleType)))
          .as("ece"))
    // A: the r14 when-guard riding the gap column
    def varA(): DataFrame = finish(binned()
      .withColumn("gap_dec", gapDec)
      .withColumn("gap", when(gapGuard.isNull, col("gap_dec").cast(LongType))))
    // B: the r15 filter-stage guard
    def varB(): DataFrame = finish(binned()
      .withColumn("gap_dec", gapDec)
      .filter(gapGuard.isNull)
      .withColumn("gap", col("gap_dec").cast(LongType)))

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both
    time(varA); time(varB)
    for (i <- 1 to n) {
      val a = time(varA)
      val b = time(varB)
      println(f"pass $i: when-guard $a%.3f s  filter-guard $b%.3f s")
    }
    spark.stop()
  }
}
