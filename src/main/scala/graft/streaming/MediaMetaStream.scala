package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.MultimodalOps

/** Streaming twin for the round-12 video lane — the ingest-side shape of
  * a multimodal corpus pipeline, where media payloads arrive continuously
  * and the catalog wants (a) per-item metadata rows as they land and (b)
  * a live per-codec census:
  *
  *  - [[metaRows]] runs [[MultimodalOps.videoMetaRows]] — the REAL
  *    encode→AVI-container-parse map — over a streaming documents frame.
  *    Stateless by construction (one fused map, nothing shuffles), so it
  *    runs in append mode with no watermark or state store, and rows are
  *    BIT-IDENTICAL to the batch `video_meta` output
  *    (MediaMetaStreamSpec pins that through a MemoryStream, across
  *    micro-batch splits and a checkpoint restart).
  *  - [[codecCensus]] folds those rows into the running
  *    (codec, fps) census — a streaming aggregation in update mode whose
  *    state is bounded by the codec×fps cardinality (a few dozen keys at
  *    ANY corpus size), re-emitting refined totals per micro-batch; the
  *    final state equals the batch census over the same corpus.
  *
  * 100 TB posture: the PARSE side is header-only per item (frame payloads
  * are never entropy-decoded — same as batch video_meta; the synthetic
  * fixture pays the full encode per row to build what it parses, but a
  * real corpus with existing AVI bytes is header-only end to end), and
  * the only shuffle carries the bounded census keys.
  */
object MediaMetaStream {

  /** (doc_id, text) frame — streaming or batch — to per-video metadata
    * rows (doc_id, codec, width, height, fps, n_frames).
    */
  def metaRows(docs: DataFrame): DataFrame =
    MultimodalOps.videoMetaRows(docs)

  /** Running per-(codec, fps) census over [[metaRows]] output — streaming
    * aggregation for update mode; on a batch frame it computes the same
    * census, which is what the spec pins the final state against.
    */
  def codecCensus(meta: DataFrame): DataFrame =
    meta.groupBy(col("codec"), col("fps"))
      .agg(
        count(lit(1)).as("n_videos"),
        sum(col("n_frames")).as("sum_frames"),
        sum(col("width").cast("long") * col("height").cast("long")
          * col("n_frames")).as("sum_frame_pixels"))

  /** The A/V lane's streaming rows: [[MultimodalOps.avSyncRows]] — the
    * SAME mux→demux→sync-report map as the batch `av_sync_check` query
    * (stateless, so it runs unmodified under an append-mode plan; the
    * spec pins bit-parity with batch across micro-batch splits).
    */
  def avRows(docs: DataFrame): DataFrame =
    MultimodalOps.avSyncRows(docs)

  /** Running A/V census over [[avRows]]: per (codec, sample_rate,
    * channels) — audio columns joining the census the r12 video lane
    * started — the item count, total frames both streams, and the
    * out-of-sync count a mux-integrity monitor alerts on. State stays
    * bounded by codec × rate-ladder × channel cardinality (a few dozen
    * keys at ANY corpus size).
    */
  def avCensus(av: DataFrame): DataFrame =
    av.groupBy(col("codec"), col("sample_rate"), col("channels"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_frames")).as("sum_video_frames"),
        sum(col("audio_frames")).as("sum_audio_frames"),
        count(when(!col("synced"), 1)).as("n_out_of_sync"))
}
