package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Technical-indicator layer over the 1-minute OHLCV rollup — the analytics
  * a user of the reference pipeline computes downstream of its
  * `trades_1min_agg` mart (reference: spark_processor/processor.py:78-101
  * builds the candles; postgres/init/init.sql:20 indexes them for exactly
  * these trailing-window scans). RSI, Bollinger bands, stochastic %K,
  * on-balance volume, and a dyadic-weight EWMA.
  *
  * Determinism contract (same discipline as [[AggOps.autocorrLag1]]): every
  * indicator works on exact integer cents — closes are 2-decimal by
  * construction so ×100 is an exact long — and every trailing-window sum,
  * min, max, and count is integer arithmetic. Doubles appear only in ONE
  * final division/sqrt sequence per output column, written symbol-for-symbol
  * identically in the oracle SQL, so results are bit-identical on any
  * partitioning and in any engine. A streaming-float `avg().over(...)` would
  * be neither (accumulation order varies with the frame walk).
  *
  * Scale posture: all indicators run on the ALREADY-AGGREGATED candle frame
  * (cardinality = minutes × symbols, not trades), partitioned by symbol —
  * one tiny exchange after the OHLCV shuffle, then embarrassingly parallel
  * per-symbol ROWS-frame walks (rank-file state, single pass, no self-join).
  */
object IndicatorOps {

  /** Candle closes as exact integer cents + integer volume units.
    * round() before the long cast: close×100 sits within 1e-10 of an
    * integer but can land a hair below (k/100 is not a binary fraction);
    * bare casts truncate in Spark and round in ANSI engines.
    */
  private def closes(spark: SparkSession, dir: String): DataFrame =
    AggOps.ohlcv1min(spark, dir).select(
      col("symbol"), col("window_start"),
      round(col("close_price") * 100).cast(LongType).as("x"),
      round(col("total_volume")).cast(LongType).as("vol"))

  private def bySym = Window.partitionBy(col("symbol")).orderBy(col("window_start"))

  private def dbl(c: Column): Column = c.cast(DoubleType)

  /** RSI(14) in the SMA (Cutler) form: 100·Σgain / (Σgain + Σloss) over the
    * trailing 14 close-to-close moves. The Wilder form is a recursive
    * exponential smoothing over an unbounded history — order-dependent float
    * state no oracle can pin; Cutler's is the standard bounded-window
    * variant and is exact here (gains/losses are integer cents). Emitted
    * only for full 14-move windows; an all-flat window (Σgain+Σloss = 0)
    * surfaces NULL rather than an arbitrary 50/100 convention.
    */
  def rsi14(spark: SparkSession, dir: String): DataFrame = {
    val w14 = bySym.rowsBetween(-13, 0)
    closes(spark, dir)
      .withColumn("diff", col("x") - lag(col("x"), 1).over(bySym))
      .filter(col("diff").isNotNull)
      .withColumn("g", sum(greatest(col("diff"), lit(0L))).over(w14))
      .withColumn("l", sum(greatest(-col("diff"), lit(0L))).over(w14))
      .withColumn("nw", count(lit(1)).over(w14))
      .filter(col("nw") === 14)
      .select(
        col("symbol"), col("window_start"),
        when(col("g") + col("l") =!= 0L,
          dbl(col("g")) * 100.0 / dbl(col("g") + col("l"))).as("rsi"))
  }

  /** Bollinger bands: 20-period SMA of closes ± 2 sample standard
    * deviations. Variance from the exact integer power sums over the frame
    * (n·Σx² − (Σx)², bounded ≲ 2^42 at these magnitudes — far inside long),
    * then one double sqrt/division sequence. Only full 20-candle windows.
    */
  def bollingerBands(spark: SparkSession, dir: String): DataFrame = {
    val w20 = bySym.rowsBetween(-19, 0)
    val mid = dbl(col("s1")) / 20.0 / 100.0
    val sd = sqrt(dbl(col("s2") * 20L - col("s1") * col("s1")) / 380.0)
    closes(spark, dir)
      .withColumn("s1", sum(col("x")).over(w20))
      .withColumn("s2", sum(col("x") * col("x")).over(w20))
      .withColumn("nw", count(lit(1)).over(w20))
      .filter(col("nw") === 20)
      .select(
        col("symbol"), col("window_start"),
        mid.as("sma"),
        (mid + lit(2.0) * sd / 100.0).as("upper_band"),
        (mid - lit(2.0) * sd / 100.0).as("lower_band"))
  }

  /** Stochastic oscillator %K(14): where the close sits inside the trailing
    * 14-candle [low, high] band, 0–100. Window min/max over integer cents,
    * one final division; a flat band (high = low) surfaces NULL.
    */
  def stochOsc(spark: SparkSession, dir: String): DataFrame = {
    val w14 = bySym.rowsBetween(-13, 0)
    closes(spark, dir)
      .withColumn("hi", max(col("x")).over(w14))
      .withColumn("lo", min(col("x")).over(w14))
      .withColumn("nw", count(lit(1)).over(w14))
      .filter(col("nw") === 14)
      .select(
        col("symbol"), col("window_start"),
        when(col("hi") =!= col("lo"),
          dbl((col("x") - col("lo")) * 100L) / dbl(col("hi") - col("lo")))
          .as("stoch_k"))
  }

  /** On-balance volume: running Σ of volume signed by the close-to-close
    * direction — the classic volume-flow momentum line. Pure int64
    * end-to-end (volumes are integer units, signs are ±1/0), so the
    * cumulative window is exact under any partitioning; the first candle
    * of a symbol contributes 0 (no prior close).
    */
  def obv(spark: SparkSession, dir: String): DataFrame =
    closes(spark, dir)
      .withColumn("diff", col("x") - lag(col("x"), 1).over(bySym))
      .withColumn("signed",
        when(col("diff") > 0L, col("vol"))
          .when(col("diff") < 0L, -col("vol"))
          .otherwise(0L))
      .withColumn("obv",
        sum(col("signed")).over(bySym.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("symbol"), col("window_start"), col("obv"))

  /** EWMA of closes with dyadic weights: α = 1/2 truncated to a 16-candle
    * window, i.e. weights 2^15, 2^14, …, 2^0 over the trailing closes,
    * normalized by 2^16 − 1. Dyadic weights make the weighted numerator an
    * EXACT integer (Σ x·2^k ≤ cents·2^16 « 2^63) — the one EWMA an oracle
    * can hash-match, where the textbook recursive form accumulates floats
    * in stream order. The 16 lag terms unroll into a single projection —
    * no self-join, one window pass.
    */
  def ewmaPrice(spark: SparkSession, dir: String): DataFrame = {
    val K = 16
    val num = (0 until K)
      .map(k =>
        (if (k == 0) col("x") else lag(col("x"), k).over(bySym)) *
          lit(1L << (K - 1 - k)))
      .reduce(_ + _)
    closes(spark, dir)
      .withColumn("num", num)
      .withColumn("x_oldest", lag(col("x"), K - 1).over(bySym))
      .filter(col("x_oldest").isNotNull)
      .select(
        col("symbol"), col("window_start"),
        (dbl(col("num")) / 65535.0 / 100.0).as("ewma"))
  }
}
