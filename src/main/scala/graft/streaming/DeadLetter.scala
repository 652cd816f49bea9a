package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming dead-letter routing — the production upgrade of the
  * reference's drop-malformed-and-count posture (processor.py:117-121 only
  * counts; [[OhlcvStream.observed]] only meters): every micro-batch is
  * split ONCE into a clean stream and a quarantine stream carrying the
  * fired rule names, the streaming twin of the batch
  * [[graft.ops.QualityOps.dqQuarantine]].
  *
  * Topology: one `foreachBatch` evaluates the rule projection a single
  * time per batch (the batch frame is persisted across the two sink
  * writes, so the source is not re-read), routes rows with any fired rule
  * to the quarantine sink WITH their `rules` array, and the rest to the
  * clean sink. Both writes inherit the query's exactly-once batch-id
  * contract — a replayed batch re-routes identically, so idempotent sinks
  * (the JDBC upsert, a partitioned parquet dir keyed by batch) stay
  * consistent. At scale the split is a pure map over rows already in
  * memory: no second scan, no shuffle, quarantine volume bounded by the
  * violation rate.
  */
object DeadLetter {

  /** Rule catalog over PARSED trades ([[OhlcvStream.parseTrades]] output):
    * (name, VIOLATION predicate). Missing identity, unparseable decimals,
    * non-positive amounts, absent event time.
    */
  def tradeRules: Seq[(String, Column)] = Seq(
    ("trade_id_present", col("trade_id").isNull),
    ("price_valid", col("price").isNull || col("price") <= 0),
    ("quantity_valid", col("quantity").isNull || col("quantity") <= 0),
    ("trade_time_present", col("trade_time").isNull))

  /** The split itself — exposed for batch backfill and tests: input rows +
    * a `rules` array of fired rule names (empty = clean).
    */
  def flagged(trades: DataFrame): DataFrame =
    flaggedWith(trades, tradeRules)

  /** Rule-split projection over ANY frame and rule catalog — the reusable
    * core of the dead-letter stage ([[CorpusPrepStream]] composes it over
    * documents with its own catalog). Pure stateless map: one array of
    * fired rule names per row, empty = clean.
    */
  def flaggedWith(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    df.withColumn("rules",
      filter(array(rules.map { case (n, p) => when(p, lit(n)) }: _*),
        x => x.isNotNull))

  /** Start the routing query: `onClean` receives rule-free rows (without
    * the `rules` column), `onQuarantine` the violating rows with it.
    */
  def route(trades: DataFrame,
            checkpointDir: String,
            onClean: (DataFrame, Long) => Unit,
            onQuarantine: (DataFrame, Long) => Unit): StreamingQuery =
    trades.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val f = flagged(batch).persist()
        try {
          onQuarantine(f.filter(size(col("rules")) > 0), id)
          onClean(f.filter(size(col("rules")) === 0).drop("rules"), id)
        } finally { f.unpersist(); () }
      }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation", checkpointDir)
      .start()
}
