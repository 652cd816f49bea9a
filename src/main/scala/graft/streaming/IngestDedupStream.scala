package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming EXACT ingest dedup with bounded state — the missing leg
  * between batch `dedup_exact` (the lake) and [[NearDupStream]]
  * (streaming NEAR-dups): the reference producer publishes with NO
  * Kafka key and reconnects with capped backoff (reference:
  * producer/producer.py:24, 100-115), and its asynchronous send is
  * at-least-once — so replayed trades are that pipeline's REAL
  * duplicate mode, and exact id-level dedup belongs at the ingest
  * front, before any aggregate sees a double-counted fill.
  *
  * Mechanism: `dropDuplicatesWithinWatermark("trade_id")` — first-seen
  * per trade_id, per-key state carrying expiry = event_time + horizon,
  * evicted once the watermark passes it. At 100 TB-scale ingest this is
  * the only tenable shape: unbounded exact-dedup state is O(all events
  * ever); within-horizon state is O(event rate × horizon), independent
  * of stream age, and the state shuffle is keyed by trade_id so it
  * scales out with executors.
  *
  * The bounded contract, stated honestly (and pinned by
  * IngestDedupStreamSpec in exactly these three branches):
  *  1. a replay WITHIN the horizon is dropped by dedup state;
  *  2. a replay of an expired id that carries its ORIGINAL event time
  *     is below the watermark and is dropped by the late-row filter —
  *     so identical-payload replays can never double-emit, no matter
  *     how late (eviction implies watermark > event_time + horizon >
  *     event_time, which makes the replay late by construction);
  *  3. a re-send of an expired id RESTAMPED with a fresh above-watermark
  *     event time (a producer that stamps send-time on retry) PASSES
  *     THROUGH as a new row — that is the price of bounded state, and
  *     the downstream [[JdbcUpsertSink]] upsert on (window, symbol) is
  *     what absorbs the rare past-horizon restamp.
  *
  * Settled-stream parity: on a prefix whose replays are all
  * identical-payload and within-horizon, the emitted rows equal batch
  * `dropDuplicates("trade_id")` over the same prefix — the batch-twin
  * discipline every streaming op here follows.
  */
object IngestDedupStream {

  /** First-seen-per-trade_id stream over parsed trades. One watermark
    * definition per column is allowed per query, so downstream stateful
    * stages compose via [[OhlcvStream.ohlcvWatermarked]].
    */
  def deduped(trades: DataFrame, watermark: String = "2 minutes"): DataFrame =
    trades
      .withWatermark("trade_time", watermark)
      .dropDuplicatesWithinWatermark("trade_id")
}
