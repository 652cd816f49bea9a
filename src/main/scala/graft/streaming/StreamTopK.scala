package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming per-window top-k: the most-traded symbols of every window —
  * TWO chained stateful aggregations in one append-mode query (per-
  * (window, symbol) volume, then per-window top-k), the multi-stateful-
  * operator capability Structured Streaming gained in Spark 3.4+ that the
  * reference's single-aggregation topology cannot express.
  *
  * Scale/semantics notes:
  *  - Both aggregations are event-time windowed under one watermark, so
  *    state for both drops as the watermark advances; the second operator's
  *    input is one row per (window, symbol) — cardinality-bounded, NOT
  *    event-bounded.
  *  - The per-window top-k is a `collect_list` + comparator `array_sort` +
  *    `slice`: safe because the collected set is the SYMBOL list of one
  *    window (bounded by |symbols|, not by trades). A deployment with an
  *    unbounded group key would cap it with the same bounded-heap shape the
  *    batch `topk_rank` plan gets from WindowGroupLimit.
  *  - Deterministic order: (volume desc, symbol asc) — total, engine-stable.
  */
object StreamTopK {

  def topSymbols(trades: DataFrame,
                 k: Int = 3,
                 windowWidth: String = "1 minute",
                 watermark: String = "2 minutes"): DataFrame = {
    val perSymbol = trades
      .withWatermark("trade_time", watermark)
      .groupBy(window(col("trade_time"), windowWidth), col("symbol"))
      .agg(sum(col("quantity")).as("volume"))
    perSymbol
      .groupBy(col("window"))
      .agg(expr(
        s"""slice(
           |  array_sort(
           |    collect_list(named_struct('volume', volume, 'symbol', symbol)),
           |    (a, b) -> CASE WHEN a.volume > b.volume THEN -1
           |                   WHEN a.volume < b.volume THEN 1
           |                   WHEN a.symbol < b.symbol THEN -1
           |                   WHEN a.symbol > b.symbol THEN 1
           |                   ELSE 0 END),
           |  1, $k)""".stripMargin).as("top"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        posexplode(col("top")).as(Seq("pos", "entry")))
      .select(
        col("window_start"), col("window_end"),
        (col("pos") + 1).cast("int").as("rank"),
        col("entry.symbol").as("symbol"),
        col("entry.volume").as("volume"))
  }
}
