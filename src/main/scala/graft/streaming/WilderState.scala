package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode}
import org.apache.spark.sql.streaming.ValueState

/** TRUE Wilder-form RSI(n)/ATR(n) as streaming state. The batch indicator
  * layer ([[graft.ops.IndicatorOps]]) deliberately pins the bounded-window
  * Cutler/dyadic forms — exact integer arithmetic an oracle can hash — but
  * Wilder's originals are recursive exponential smoothings over an
  * UNBOUNDED history: avg_t = (avg_{t-1}·(n−1) + x_t)/n. That is float
  * state carried forward forever, which is exactly what
  * `transformWithState` exists for: one small value-state per symbol,
  * updated per candle, checkpoint-recoverable, no window re-scan.
  *
  * Semantics (Wilder's definitions):
  *  - seed: after the first n close-to-close moves, avgGain/avgLoss/ATR
  *    start as plain means of the first n gains/losses/true-ranges;
  *  - then each candle smooths: avg ← (avg·(n−1) + x)/n;
  *  - RSI = 100 − 100/(1 + avgGain/avgLoss), 100 when avgLoss = 0;
  *  - TR = max(hi−lo, |hi−prevClose|, |lo−prevClose|).
  *  - Emission starts at the seeding candle (move n), matching the
  *    textbook warm-up; earlier candles only accumulate.
  *
  * Ordering: rows are processed in event-time order within a micro-batch;
  * a LATE candle (timestamp ≤ the last applied one) is SKIPPED — a Wilder
  * recursion is order-defined, and retro-applying a late candle would
  * require replaying every subsequent smoothing step (state the processor
  * deliberately does not keep). Upstream, the candle feed is the output of
  * a watermarked OHLCV aggregation, which already emits in window order
  * per symbol.
  *
  * Scale: state is one ~9-field record per symbol — cardinality-bounded;
  * the shuffle is the groupByKey hash exchange on symbol, identical to the
  * other per-symbol stateful ops. `TimeMode.None` drives batches purely by
  * data arrival.
  */
object WilderState {

  final case class CandleRow(
      symbol: String, window_start: Timestamp,
      high: Double, low: Double, close: Double)

  final case class WilderRow(
      symbol: String, window_start: Timestamp, rsi: Double, atr: Double)

  final case class WilderAgg(
      prevClose: Double, lastMs: Long, nMoves: Int,
      gainSum: Double, lossSum: Double, trSum: Double,
      avgGain: Double, avgLoss: Double, atr: Double)

  class Processor(period: Int)
      extends StatefulProcessor[String, CandleRow, WilderRow] {

    @transient private var st: ValueState[WilderAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[WilderAgg](
        "wilder", Encoders.product[WilderAgg],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        symbol: String,
        rows: Iterator[CandleRow],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[WilderRow] = {
      val out = Seq.newBuilder[WilderRow]
      rows.toSeq.sortBy(_.window_start.getTime).foreach { c =>
        val ms = c.window_start.getTime
        if (!st.exists()) {
          st.update(WilderAgg(c.close, ms, 0, 0, 0, 0, 0, 0, 0))
        } else {
          val s = st.get()
          if (ms > s.lastMs) { // late candles cannot be retro-smoothed: skip
            val gain = math.max(c.close - s.prevClose, 0.0)
            val loss = math.max(s.prevClose - c.close, 0.0)
            val tr = math.max(c.high - c.low,
              math.max(math.abs(c.high - s.prevClose), math.abs(c.low - s.prevClose)))
            val n = s.nMoves + 1
            val next =
              if (n < period)
                s.copy(prevClose = c.close, lastMs = ms, nMoves = n,
                  gainSum = s.gainSum + gain, lossSum = s.lossSum + loss,
                  trSum = s.trSum + tr)
              else if (n == period)
                s.copy(prevClose = c.close, lastMs = ms, nMoves = n,
                  avgGain = (s.gainSum + gain) / period,
                  avgLoss = (s.lossSum + loss) / period,
                  atr = (s.trSum + tr) / period)
              else
                s.copy(prevClose = c.close, lastMs = ms, nMoves = n,
                  avgGain = (s.avgGain * (period - 1) + gain) / period,
                  avgLoss = (s.avgLoss * (period - 1) + loss) / period,
                  atr = (s.atr * (period - 1) + tr) / period)
            st.update(next)
            if (n >= period) {
              val rsi =
                if (next.avgLoss == 0.0) 100.0
                else 100.0 - 100.0 / (1.0 + next.avgGain / next.avgLoss)
              out += WilderRow(symbol, c.window_start, rsi, next.atr)
            }
          }
        }
      }
      out.result().iterator
    }
  }

  /** candle stream → per-candle Wilder RSI/ATR once the seed period fills. */
  def indicators(candles: Dataset[CandleRow], period: Int = 14): Dataset[WilderRow] = {
    import candles.sparkSession.implicits._
    candles
      .groupByKey(_.symbol)
      .transformWithState(
        new Processor(period),
        TimeMode.None(),
        OutputMode.Update())
  }
}
