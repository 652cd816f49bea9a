package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.{PipelineOps, QualityOps, RelationalOps}

/** Streaming twin for the r15 planning lane (`salt_plan` /
  * `join_size_estimate`) — the advisory tables a long-running pipeline
  * keeps FRESH instead of recomputing batch-side before every run:
  *
  *  - [[keyCounts]] is an update-mode streaming aggregation of per-key
  *    row counts (state bounded by key cardinality, the codecCensus
  *    shape); each micro-batch re-emits only the CHANGED keys.
  *  - [[saltAdvisory]] applies [[QualityOps.saltAdvisory]] — the SAME
  *    arithmetic object the batch `salt_plan` runs, single-sourced so
  *    stream and batch can never drift — inside `foreachBatch`, upserting
  *    refreshed (key, cnt, n_salts, post_rows_max) rows into whatever
  *    sink the caller provides (JDBC advisory table in production, an
  *    in-memory map in the spec). Unchanged keys keep their previous
  *    advisory row — update-mode delta semantics are exactly advisory
  *    upsert semantics.
  *  - [[sampledKeyCounts]] + [[joinSizeAdvisory]] close the
  *    join_size_estimate loop: the stream side keeps per-key counts ONLY
  *    for the shared key-aligned sample (`hashBucket(k) < pct`, the same
  *    split/pps-family bucketing as the batch op — both join sides keep
  *    the SAME sampled keys, which is what makes Σ cnt_s·cnt_d an
  *    unbiased p²-sample of the join size), so streaming state is
  *    pct% of key cardinality; each refresh joins the delta against the
  *    small static dim-side sample counts and re-emits the scaled
  *    estimate.
  *
  * 100 TB posture: nothing here ever holds raw rows — the only state is
  * per-key (or per-sampled-key) counts, and every refresh shuffles
  * key-cardinality-sized frames. The estimate leg broadcast-joins the
  * dim-side sample counts (a pct%-of-keys frame).
  */
object SkewAdvisorStream {

  /** Per-key running counts — streaming (update mode) or batch. */
  def keyCounts(events: DataFrame, keyCol: String = "event_type"): DataFrame =
    events.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cnt"))

  /** Per-key running counts over the key-aligned sample only (the batch
    * join_size_estimate's bucketing): state is pct% of key cardinality.
    */
  def sampledKeyCounts(rows: DataFrame, keyCol: String,
                       pct: Long = RelationalOps.JoinSamplePct): DataFrame =
    rows.filter(PipelineOps.hashBucket(col(keyCol)) < lit(pct))
      .groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cnt"))

  /** The per-refresh join-size estimate: stream-side sampled key counts ×
    * dim-side sampled key counts, summed and scaled by 100/pct — the
    * key-aligned sample keeps a KEY (with all its rows, both sides) with
    * probability p = pct/100, so E[Σ cnt_s·cnt_d over kept keys] =
    * p · true join size and the scale-up is exactly the batch op's
    * `scale`. One broadcastable join of two sampled-key-cardinality
    * frames.
    */
  def joinSizeAdvisory(streamSample: DataFrame, dimSample: DataFrame,
                       pct: Long = RelationalOps.JoinSamplePct): DataFrame = {
    // integer scale-up: a pct that does not divide 100 would silently
    // truncate 100/pct and bias the estimate — fail loudly instead
    require(pct > 0 && 100 % pct == 0,
      s"pct must be a positive divisor of 100, got $pct")
    val d = dimSample.select(col("key"), col("cnt").as("dim_cnt"))
    streamSample.join(d, "key")
      .agg(coalesce(sum(col("cnt") * col("dim_cnt")), lit(0L)).as("sample_rows"))
      .select(col("sample_rows"),
        (col("sample_rows") * lit(100L / pct)).as("est_rows"))
  }

  /** Running per-key DISTINCT-cardinality advisory via the deterministic
    * KMV sketch ([[graft.functions.KmvSketch]], same k as the batch
    * `kmv_distinct`): an update-mode streaming aggregation whose state
    * per key is the 8·(k+1)-byte sketch buffer, re-emitting the refined
    * estimate for changed keys each micro-batch. Because KMV state is
    * merge-order independent, the converged stream state EQUALS the
    * batch op on the same data — the spec pins it row-for-row, the
    * property no HLL stream twin could offer.
    */
  def distinctCounts(events: DataFrame, keyCol: String = "event_type",
                     valueCol: String = "user_id"): DataFrame = {
    val kmv = org.apache.spark.sql.functions.udaf(
      new graft.functions.KmvSketch(graft.ops.StatsOps.KmvDistinctK))
    events.groupBy(col(keyCol).as("key"))
      .agg(
        count(lit(1)).as("cnt"),
        kmv(graft.functions.KmvSketch.hash60(col(valueCol).cast("string")))
          .as("n_distinct_est"))
  }

  /** Drive [[keyCounts]] through `foreachBatch`, handing every refresh the
    * SALT ADVISORY rows for the keys that changed in that micro-batch.
    * The caller upserts them (JDBC in production; the spec accumulates
    * into a map and pins the final table against batch `salt_plan`).
    */
  def advisories(counts: DataFrame, checkpoint: String,
                 trigger: org.apache.spark.sql.streaming.Trigger =
                   org.apache.spark.sql.streaming.Trigger.AvailableNow())
                (onRefresh: (Array[org.apache.spark.sql.Row], Long) => Unit): StreamingQuery =
    counts.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // collect is bounded: update-mode deltas over a key-cardinality
        // state — at most |keys| rows per refresh
        onRefresh(QualityOps.saltAdvisory(batch).collect(), id)
        ()
      }
      .start()
}
