package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, ValueState}

/** Per-symbol price-spike detector on `transformWithState` — Spark 4's
  * successor to `flatMapGroupsWithState` (see [[RunningStats]] for the
  * classic API): state is declared as named, individually-evictable
  * variables on a [[StatefulProcessorHandle]] instead of one opaque blob,
  * with per-state TTL handled by the runtime rather than hand-rolled
  * timeout bookkeeping.
  *
  * Semantics: for each trade, emit an alert when the price moved more than
  * `thresholdPct` from the previous trade of the same symbol. State is one
  * (price, time) pair per symbol, driven purely by data arrival
  * (`TimeMode.None`): no timers, so the engine schedules micro-batches
  * only when input exists. A deployment that must also EVICT idle-symbol
  * state switches to `TimeMode.ProcessingTime` + a `TTLConfig` on the
  * value state — the cost is that the runtime then triggers batches
  * continuously to evaluate timers even with no data.
  */
object SpikeDetector {

  final case class PriceAlert(
      symbol: String, prev_price: Double, price: Double,
      move_pct: Double, trade_time: Timestamp)

  final case class LastPrice(price: Double, atMs: Long)

  /** One detector instance per query (holds no Spark state of its own —
    * everything lives in the store, so restarts recover from checkpoint).
    */
  class Processor(thresholdPct: Double)
      extends StatefulProcessor[String, RunningStats.TradeRow, PriceAlert] {

    @transient private var last: ValueState[LastPrice] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[LastPrice](
        "lastPrice", Encoders.product[LastPrice],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        symbol: String,
        rows: Iterator[RunningStats.TradeRow],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[PriceAlert] = {
      val out = Seq.newBuilder[PriceAlert]
      // event-time order for a deterministic previous-price chain
      rows.toSeq.sortBy(r => (r.trade_time.getTime, r.price)).foreach { r =>
        val prev = if (last.exists()) Some(last.get()) else None
        // a LATE trade (state already holds a newer price) neither alerts
        // nor updates: comparing it against a chronologically newer price
        // would fire a phantom spike whose "previous" trade is in the
        // alert's future
        prev.foreach { p =>
          if (p.atMs <= r.trade_time.getTime) {
            val movePct = math.abs(r.price - p.price) / p.price * 100.0
            if (movePct > thresholdPct)
              out += PriceAlert(symbol, p.price, r.price, movePct, r.trade_time)
          }
        }
        if (prev.forall(_.atMs <= r.trade_time.getTime))
          last.update(LastPrice(r.price, r.trade_time.getTime))
      }
      out.result().iterator
    }
  }

  /** typed trades (post-[[OhlcvStream.parseTrades]]) → spike alerts. */
  def detect(trades: Dataset[RunningStats.TradeRow],
             thresholdPct: Double = 5.0): Dataset[PriceAlert] = {
    import trades.sparkSession.implicits._
    trades
      .groupByKey(_.symbol)
      .transformWithState(
        new Processor(thresholdPct),
        TimeMode.None(),
        OutputMode.Update())
  }
}
