package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join — the enrichment topology the
  * reference's single-stream pipeline stops short of: a trade stream joined
  * to a quote stream on symbol, with each trade matched to quotes in the
  * preceding `lookback` of event time.
  *
  * State management is what makes this scale: BOTH sides are watermarked
  * and the join condition bounds quote_time relative to trade_time, so
  * Spark derives a state-eviction watermark per side — buffered rows are
  * dropped once they can no longer match anything (state size tracks
  * lookback + lateness horizon, never stream history). Without the time
  * bound a stream-stream join must buffer forever; this operator refuses
  * that shape by construction.
  */
object StreamJoin {

  /** Inner interval join. `trades` needs (trade_id, symbol, price,
    * trade_time); `quotes` needs (q_symbol, bid, ask, quote_time).
    * Emits one row per (trade, in-window quote) with the quote spread —
    * append-mode compatible (inner join, both sides watermarked).
    */
  def tradesWithQuotes(trades: DataFrame, quotes: DataFrame,
                       lookback: String = "10 seconds",
                       lateness: String = "1 minute"): DataFrame = {
    val t = trades.withWatermark("trade_time", lateness)
    val q = quotes.withWatermark("quote_time", lateness)
    t.join(q,
        col("symbol") === col("q_symbol") &&
          col("quote_time") >= col("trade_time") - expr(s"INTERVAL $lookback") &&
          col("quote_time") <= col("trade_time"))
      .select(
        col("trade_id"), col("symbol"), col("price"),
        col("quote_time"), col("bid"), col("ask"),
        (col("ask") - col("bid")).as("spread"))
  }

  /** LEFT OUTER interval join — [[tradesWithQuotes]] that also emits
    * quote-less trades. The semantics only exist BECAUSE state is bounded:
    * an outer result cannot be emitted when the trade arrives (a matching
    * quote may still come), so Spark holds the trade in state and emits
    * the null-padded row exactly when the quote-side watermark passes the
    * end of the trade's match window — i.e. when "no match" becomes a
    * theorem rather than an observation. Downstream consumers therefore
    * see matched rows promptly and unmatched rows one lateness horizon
    * later; that delay is the price of append-mode exactly-once (no
    * retractions). Same eviction bounds as the inner form — state size
    * tracks lookback + lateness, never stream history.
    */
  def tradesWithQuotesLeftOuter(trades: DataFrame, quotes: DataFrame,
                                lookback: String = "10 seconds",
                                lateness: String = "1 minute"): DataFrame = {
    val t = trades.withWatermark("trade_time", lateness)
    val q = quotes.withWatermark("quote_time", lateness)
    t.join(q,
        col("symbol") === col("q_symbol") &&
          col("quote_time") >= col("trade_time") - expr(s"INTERVAL $lookback") &&
          col("quote_time") <= col("trade_time"),
        "leftOuter")
      .select(
        col("trade_id"), col("symbol"), col("price"),
        col("quote_time"), col("bid"), col("ask"),
        (col("ask") - col("bid")).as("spread"))
  }

  /** Stream-static enrichment: each streaming trade joined to a static
    * dimension table on symbol. The static side is broadcast — no state,
    * no watermark needed (a static side can't be late), and the stream
    * never shuffles: the canonical shape for reference-data enrichment.
    * Left join keeps trades whose symbol is missing from the dimension.
    */
  def enrichWithDim(trades: DataFrame, symbolDim: DataFrame): DataFrame =
    trades.join(broadcast(symbolDim), Seq("symbol"), "left")
}
