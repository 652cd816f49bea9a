package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.ops.TextOps

/** Streaming twin of the batch `preference_pairs` miner — the shape a
  * continuously-ingesting RLHF/DPO data-prep service runs: as documents
  * arrive, each (lang, source) group's running BEST and WORST candidates
  * update in place, and the (chosen, rejected) pair for a group re-emits
  * whenever a new arrival displaces either end (update output mode).
  *
  * The score projection and the min_by/max_by aggregation are the SAME
  * code the batch op runs ([[graft.ops.TextOps]]'s shared builders), so
  * the settled streaming state is bit-identical to a batch run over the
  * same rows — PreferencePairsStreamSpec pins that across micro-batch
  * splits, including the mid-stream invariant that the state after a
  * PREFIX of the corpus equals the batch answer on that prefix (running
  * extremes are prefix-decomposable).
  *
  * Scale/state posture: the state store holds one (count, max-struct,
  * min-struct) row per (lang, source) — bounded by the group census like
  * MediaMetaStream, NOT by corpus size — and no watermark is needed
  * because the extremes never expire. The margin/size gates run as a
  * stateless filter over the updated rows.
  */
object PreferencePairsStream {

  /** `docs` — a streaming (or batch) frame with
    * (doc_id, text, lang, source, n_chars) — to gated running pairs.
    */
  def pairs(docs: DataFrame): DataFrame =
    TextOps.pairsFromScored(TextOps.withScore(docs))
}
