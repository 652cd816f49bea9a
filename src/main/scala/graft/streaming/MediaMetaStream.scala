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
}
