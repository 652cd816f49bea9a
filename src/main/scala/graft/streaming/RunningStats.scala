package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom arbitrary-state streaming operator
  * (`flatMapGroupsWithState`) — the mechanism the reference never needs
  * (its only stateful op is the windowed aggregation,
  * spark_processor/processor.py:79) but a real trading/training pipeline
  * does: running per-symbol statistics that survive across micro-batches
  * with explicit state lifecycle.
  *
  * Tracks, per symbol: cumulative trade count, running high/low, and the
  * latest price — emitting one updated row per symbol per micro-batch that
  * saw data. State is evicted after `stateTtlMs` of event-time silence via
  * EventTimeTimeout, so state size is bounded by ACTIVE key cardinality,
  * not history — the property that lets this run forever at scale.
  */
object RunningStats {

  final case class TradeRow(
      symbol: String, price: Double, trade_time: Timestamp)

  final case class SymbolState(
      nTrades: Long, high: Double, low: Double, last: Double, lastMs: Long)

  final case class SymbolStats(
      symbol: String, n_trades: Long, high: Double, low: Double, last: Double)

  /** typed trades (post-[[OhlcvStream.parseTrades]]) → running stats. */
  def runningStats(trades: Dataset[TradeRow], watermark: String = "2 minutes",
                   stateTtl: String = "1 hour"): Dataset[SymbolStats] = {
    import trades.sparkSession.implicits._
    trades
      .withWatermark("trade_time", watermark)
      .groupByKey(_.symbol)
      .flatMapGroupsWithState[SymbolState, SymbolStats](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        case (symbol, rows, state: GroupState[SymbolState]) =>
          if (state.hasTimedOut) {
            state.remove() // idle symbol: free the state, emit nothing
            Iterator.empty
          } else {
            var s = state.getOption.getOrElse(
              SymbolState(0L, Double.MinValue, Double.MaxValue, Double.NaN, 0L))
            // iterate in event-time order for deterministic `last`
            rows.toSeq.sortBy(r => (r.trade_time.getTime, r.price)).foreach { r =>
              s = SymbolState(
                nTrades = s.nTrades + 1,
                high = math.max(s.high, r.price),
                low = math.min(s.low, r.price),
                last = r.price,
                lastMs = math.max(s.lastMs, r.trade_time.getTime))
            }
            state.update(s)
            state.setTimeoutTimestamp(s.lastMs, stateTtl)
            Iterator(SymbolStats(symbol, s.nTrades, s.high, s.low, s.last))
          }
      }
  }
}
