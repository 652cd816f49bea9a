package graft

import java.sql.Timestamp
import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, Row}

import graft.streaming.WilderState
import graft.streaming.WilderState.CandleRow

/** True Wilder RSI/ATR recursion as transformWithState, pinned against a
  * straight-line Scala recursion over the same replayed candle series —
  * multi-batch replay (state continuity), two symbols (isolation), a late
  * candle (skipped, not retro-smoothed).
  */
class WilderStateSpec extends SparkSuite {

  private val T0 = 1705276800000L
  private val Period = 14

  /** deterministic synthetic candles: close walks on a fixed recurrence */
  private def series(sym: String, n: Int, seed: Long): Seq[CandleRow] = {
    var x = seed
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    (0 until n).map { i =>
      val close = 100.0 + (next() % 1000).toDouble / 100.0
      val hi = close + (next() % 300).toDouble.abs / 100.0
      val lo = close - (next() % 300).toDouble.abs / 100.0
      CandleRow(sym, new Timestamp(T0 + i * 60000L), hi, lo, close)
    }
  }

  /** the textbook recursion, straight-line */
  private def truth(cs: Seq[CandleRow]): Seq[(Long, Double, Double)] = {
    val out = mutable.Buffer[(Long, Double, Double)]()
    var prevClose = cs.head.close
    var gSum = 0.0; var lSum = 0.0; var tSum = 0.0
    var avgG = 0.0; var avgL = 0.0; var atr = 0.0
    cs.drop(1).zipWithIndex.foreach { case (c, i) =>
      val n = i + 1
      val gain = math.max(c.close - prevClose, 0.0)
      val loss = math.max(prevClose - c.close, 0.0)
      val tr = math.max(c.high - c.low,
        math.max(math.abs(c.high - prevClose), math.abs(c.low - prevClose)))
      if (n < Period) { gSum += gain; lSum += loss; tSum += tr }
      else if (n == Period) {
        avgG = (gSum + gain) / Period; avgL = (lSum + loss) / Period
        atr = (tSum + tr) / Period
      } else {
        avgG = (avgG * (Period - 1) + gain) / Period
        avgL = (avgL * (Period - 1) + loss) / Period
        atr = (atr * (Period - 1) + tr) / Period
      }
      if (n >= Period) {
        val rsi = if (avgL == 0.0) 100.0 else 100.0 - 100.0 / (1.0 + avgG / avgL)
        out += ((c.window_start.getTime, rsi, atr))
      }
      prevClose = c.close
    }
    out.toSeq
  }

  test("streaming Wilder RSI/ATR equals the straight-line recursion, per symbol, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val btc = series("BTC", 40, 7L)
    val eth = series("ETH", 25, 99L)
    val input = MemoryStream[CandleRow]
    val out = mutable.Buffer[Row]()
    val q = WilderState.indicators(input.toDS(), Period).toDF().writeStream
      .outputMode("update")
      .foreachBatch { (df: DataFrame, _: Long) => out ++= df.collect(); () }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("wilder_ckpt").toString)
      .start()
    try {
      // replay interleaved in three batches; a LATE duplicate of an old
      // BTC candle rides in batch 3 and must change nothing
      input.addData(btc.take(10) ++ eth.take(20))
      q.processAllAvailable()
      input.addData(btc.slice(10, 30) ++ eth.drop(20))
      q.processAllAvailable()
      input.addData(btc.drop(30) :+ btc(5).copy(close = 9999.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = out.groupBy(_.getAs[String]("symbol")).map { case (s, rows) =>
      s -> rows.map(r => (r.getAs[Timestamp]("window_start").getTime,
        r.getAs[Double]("rsi"), r.getAs[Double]("atr")))
        .sortBy(_._1).toSeq
    }
    assert(got("BTC") === truth(btc))
    assert(got("ETH") === truth(eth))
    // warm-up discipline: first emission is at move `Period`
    assert(got("BTC").head._1 === T0 + Period * 60000L)
    assert(got("BTC").size === 40 - Period)
  }
}
