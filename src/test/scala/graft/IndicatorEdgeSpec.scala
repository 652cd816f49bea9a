package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.IndicatorOps

/** Degenerate-series edge cases for the indicator layer, on a synthetic
  * corpus the real fixtures never produce: a constant-price symbol (zero
  * variance in every window), a single-candle symbol, and a normal walk.
  * Under Spark 4's ANSI mode an unguarded division aborts the whole query
  * on exactly these inputs — each assertion here exercises a NULL-guard
  * branch that the fixture-based ground-truth specs cannot reach.
  */
class IndicatorEdgeSpec extends SparkSuite {

  private val T0 = 1705276800000L // 2024-01-15 00:00:00 UTC

  /** events dir: FLAT = 40 minutes at a constant 100.00; ONE = a single
    * event in minute 0; MIX = a deterministic walk over 40 minutes.
    */
  private lazy val dir: String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ind_edge").toString
    def ev(id: Long, sym: String, minute: Int, price: Double) =
      (id, new Timestamp(T0 + minute * 60000L), id % 7, sym, price, """{"k": 5}""")
    val flat = (0 until 40).map(m => ev(1000L + m, "FLAT", m, 100.00))
    val one = Seq(ev(2000L, "ONE", 0, 50.00))
    val mix = (0 until 40).map(m => ev(3000L + m, "MIX", m, 100.00 + (m % 7) - 3 + 0.25 * (m % 4)))
    (flat ++ one ++ mix)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("zscore_anomaly: zero-variance and single-candle symbols yield no rows, no abort") {
    val out = IndicatorOps.zscoreAnomaly(spark, dir).collect()
    assert(!out.exists(r => r.getString(0) == "FLAT" || r.getString(0) == "ONE"))
  }

  test("pairwise_corr: pairs involving a degenerate side have NULL corr") {
    val out = IndicatorOps.pairwiseCorr(spark, dir).collect()
    val deg = out.filter(r =>
      Set(r.getString(0), r.getString(1)).exists(Set("FLAT", "ONE")))
    assert(deg.nonEmpty)
    deg.foreach(r => assert(r.isNullAt(3), r))
  }

  test("rsi_14 and mfi_14 are NULL on a flat series (no gains, no flows)") {
    Seq(IndicatorOps.rsi14 _, IndicatorOps.mfi14 _).foreach { op =>
      val rows = op(spark, dir).filter(col("symbol") === "FLAT").collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.isNullAt(2), r))
    }
  }

  test("stoch_osc is NULL on a flat band; atr_14 and obv are exactly zero") {
    val st = IndicatorOps.stochOsc(spark, dir).filter(col("symbol") === "FLAT").collect()
    assert(st.nonEmpty); st.foreach(r => assert(r.isNullAt(2), r))
    val atr = IndicatorOps.atr14(spark, dir).filter(col("symbol") === "FLAT").collect()
    assert(atr.nonEmpty); atr.foreach(r => assert(r.getDouble(2) === 0.0, r))
    val obv = IndicatorOps.obv(spark, dir).filter(col("symbol") === "FLAT").collect()
    assert(obv.nonEmpty); obv.foreach(r => assert(r.getLong(2) === 0L, r))
  }

  test("bollinger bands collapse to the sma and ewma equals the price on a flat series") {
    val bb = IndicatorOps.bollingerBands(spark, dir)
      .filter(col("symbol") === "FLAT").collect()
    assert(bb.nonEmpty)
    bb.foreach { r =>
      assert(r.getDouble(2) === 100.0 && r.getDouble(3) === 100.0 && r.getDouble(4) === 100.0, r)
    }
    val ew = IndicatorOps.ewmaPrice(spark, dir).filter(col("symbol") === "FLAT").collect()
    assert(ew.nonEmpty); ew.foreach(r => assert(r.getDouble(2) === 100.0, r))
  }

  test("MIX symbol still produces non-degenerate indicator values on the synthetic corpus") {
    assert(IndicatorOps.rsi14(spark, dir).filter(col("symbol") === "MIX")
      .filter(col("rsi").isNotNull).count() > 0)
    assert(IndicatorOps.stochOsc(spark, dir).filter(col("symbol") === "MIX")
      .filter(col("stoch_k").isNotNull).count() > 0)
    assert(IndicatorOps.atr14(spark, dir).filter(col("symbol") === "MIX")
      .filter(col("atr") > 0.0).count() > 0)
  }
}
