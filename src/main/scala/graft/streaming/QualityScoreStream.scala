package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.ops.ClassifierOps

/** Train-offline / score-online half of the quality-classifier lifecycle:
  * the model trained by [[graft.ops.ClassifierOps.train]] (on a batch
  * corpus sample) scores a STREAMING documents source — the shape a
  * production ingest filter runs, where every arriving document gets a
  * quality decision before it reaches the corpus.
  *
  * Entirely STATELESS by construction: the D+1 weights are baked into the
  * plan as a broadcast literal map, tokenize→hash→margin is a per-row
  * fold, and nothing shuffles — so the query runs in append mode with no
  * watermark, no state store, and exactly-once semantics reduce to the
  * sink's. Back-pressure is the micro-batch size; scoring throughput
  * scales with input partitions like any map-only stage. The SAME
  * projection scores the batch corpus ([[ClassifierOps.qualityClassifier]]
  * runs it over the checkpointed training frame), so batch and stream
  * scores are bit-identical — QualityScoreStreamSpec pins that through a
  * MemoryStream.
  */
object QualityScoreStream {

  /** `docs` — a (streaming or batch) frame with (doc_id, text, lang) —
    * scored with trained weights: (doc_id, label, score, pred_en, split).
    */
  def scored(docs: DataFrame, w: Array[Double], b: Double): DataFrame =
    ClassifierOps.scoreFeatures(ClassifierOps.features(docs), w, b)
}
