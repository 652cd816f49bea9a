package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming session analytics: activity sessions per symbol, where a
  * session is a run of trades with no gap larger than `gap` — the streaming
  * twin of the batch `session_window`/`sessionize` operators (AggOps/
  * StatsOps), extending the reference's fixed-window pipeline
  * (spark_processor/processor.py:78-101) with data-driven windows.
  *
  * Scale/semantics notes:
  *  - `session_window` state merges adjacent windows as bridging events
  *    arrive and is dropped once the watermark passes a session's end+gap —
  *    state size tracks OPEN sessions per key, not stream history.
  *  - Aggregates are the deterministic kind (`min_by`/`max_by` on a
  *    `(trade_time, trade_id)` order key, sums) — encounter-order
  *    `first`/`last` drift under multi-partition shuffle (same divergence
  *    the OHLCV stage documents).
  *  - Designed for APPEND output: a session row emits exactly once, when
  *    the watermark closes it — the natural mode for session facts (a
  *    session is only meaningful once complete). Update mode also works
  *    but re-emits a session every time it grows or merges.
  */
object SessionStream {

  /** Per-(session, symbol) trade session over a parsed trade stream
    * ([[OhlcvStream.parseTrades]] output shape): session bounds, trade
    * count, volume, VWAP, and open/close prices.
    */
  def sessions(trades: DataFrame,
               gap: String = "30 seconds",
               watermark: String = "2 minutes"): DataFrame = {
    val orderKey: Column = struct(col("trade_time"), col("trade_id"))
    trades
      .withWatermark("trade_time", watermark)
      .groupBy(session_window(col("trade_time"), gap).as("sw"), col("symbol"))
      .agg(
        count(lit(1)).as("n_trades"),
        min_by(col("price"), orderKey).as("open_price"),
        max_by(col("price"), orderKey).as("close_price"),
        sum(col("quantity")).as("total_volume"),
        sum(col("trade_value")).as("total_trade_value"))
      .select(
        col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("symbol"),
        col("n_trades"),
        col("open_price"),
        col("close_price"),
        col("total_volume"),
        when(col("total_volume") =!= 0,
          col("total_trade_value") / col("total_volume")).as("vwap"))
  }
}
