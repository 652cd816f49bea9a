package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues}

import graft.ops.{ClassifierOps, DedupOps}

/** The STREAMING prep capstone — the streaming twin of the batch
  * `corpus_pipeline` composition: documents arrive as a stream and pass
  * the same gauntlet a training corpus passes at ingest, composed from
  * the three existing streaming precedents into ONE append-mode topology:
  *
  *  1. [[DeadLetter]]'s rule split ([[docRules]] — the `corpus_clean`
  *     filter chain restated as a dead-letter catalog: language
  *     whitelist, token-count bounds). Stateless projection; violating
  *     rows carry their fired rule names and leave the pipeline here.
  *  2. [[QualityScoreStream]]'s broadcast-literal scoring
  *     ([[ClassifierOps.withScore]], the retaining form): the offline-
  *     trained weights ride the plan as a literal map, the margin is a
  *     deterministic per-row fold, rows below the 0.5 score threshold
  *     leave. Still stateless, still no shuffle.
  *  3. [[NearDupStream]]'s LSH stage: the same `word3gram_hashes` →
  *     `minhash_sig` → 16-band explosion, keyed on (band_id, band_hash)
  *     through the topology's ONLY shuffle into `transformWithState` —
  *     but emitting a VERDICT row per (doc, band) rather than matches
  *     only, so the sink alone determines the surviving corpus: a doc
  *     survives iff none of its 16 band verdicts matched an earlier
  *     resident at est_jaccard ≥ threshold. First-seen-wins, bucket
  *     residency capped at the batch [[DedupOps.MaxBucket]] constant.
  *
  * Equality contract (CorpusPrepStreamSpec): replaying the documents
  * corpus through this topology across micro-batches — with a checkpoint
  * restart in the middle — yields EXACTLY the batch pipeline's surviving
  * doc set (corpus_clean's lang/token filters ∘ score ≥ 0.5 ∘ first-seen
  * near-dup). Exact-text duplicates need no dedicated streaming stage:
  * identical texts produce identical signatures, hence est 1.0 in every
  * shared bucket — the LSH stage subsumes corpus_clean's exact-dedup
  * window.
  *
  * Scale: stages 1–2 are map-only (scale with input partitions, no
  * state); stage 3's shuffle carries (band keys, id, 64-long signature)
  * — never text — and per-bucket state is ≤ MaxBucket signatures, the
  * same bound as the batch equi-join's bucket cap. At 100 TB the
  * verdict stream is 16 small rows per surviving doc; quarantine and
  * low-quality volumes are bounded by their rates.
  */
object CorpusPrepStream {

  /** Streaming input row: the documents-table columns the gauntlet needs. */
  final case class PrepDoc(doc_id: Long, text: String, lang: String)

  /** One per (doc, band): `matched` with the earlier resident it hit, or
    * a pass verdict (dup_of = -1). Survivor ⟺ no matched=true row.
    */
  final case class PrepVerdict(doc_id: Long, band_id: Int, matched: Boolean,
      dup_of: Long, est_jaccard: Double)

  /** `corpus_clean`'s filter chain as a [[DeadLetter]] rule catalog
    * (predicates state the VIOLATION, dead-letter convention).
    */
  def docRules: Seq[(String, Column)] = Seq(
    ("lang_allowed", !col("lang").isin("en", "de", "fr", "es")),
    ("token_bounds", !size(split(trim(col("text")), " ")).between(5, 2000)))

  /** Stage-1 rule split over documents — [[DeadLetter.flaggedWith]] with
    * [[docRules]]; exposed so callers can route the quarantine lane the
    * dead-letter way (rows with a non-empty `rules` array + names).
    */
  def flagged(docs: DataFrame): DataFrame =
    DeadLetter.flaggedWith(docs, docRules)

  /** Verdict-emitting twin of [[NearDupStream.Processor]]: same
    * first-seen-wins residency (every arriving doc joins its bucket when
    * there is room, matched or not — matches may blame dropped docs,
    * exactly the batch greedy-by-id contract), same capped state, same
    * [[NearDupStream.estimate]]; but every (doc, band) emits — matches
    * against each hit resident, or one pass row — so survivors are
    * derivable from the output stream alone.
    */
  class VerdictProcessor(threshold: Double, maxBucket: Int)
      extends StatefulProcessor[(Int, Long), NearDupStream.BandRow, PrepVerdict] {

    @transient private var seen: ListState[NearDupStream.DocSig] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[NearDupStream.DocSig](
        "seen", Encoders.product[NearDupStream.DocSig], org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: (Int, Long),
        rows: Iterator[NearDupStream.BandRow],
        timerValues: TimerValues): Iterator[PrepVerdict] = {
      val out = Seq.newBuilder[PrepVerdict]
      var residents = seen.get().toSeq // bounded: <= maxBucket entries
      var n = residents.size
      rows.toSeq.sortBy(_.doc_id).foreach { r =>
        var any = false
        residents.foreach { s =>
          val est = NearDupStream.estimate(r.sig, s.sig)
          if (est >= threshold) {
            any = true
            out += PrepVerdict(r.doc_id, r.band_id, matched = true, s.doc_id, est)
          }
        }
        if (!any)
          out += PrepVerdict(r.doc_id, r.band_id, matched = false, -1L, 0.0)
        if (n < maxBucket) {
          val ds = NearDupStream.DocSig(r.doc_id, r.sig)
          seen.appendValue(ds)
          residents = residents :+ ds
          n += 1
        }
      }
      out.result().iterator
    }
  }

  /** The composed topology: rule split → quality threshold → LSH verdict
    * stage, one streaming Dataset a single `writeStream` drains in
    * append mode. `docs` carries (doc_id, text, lang); weights come from
    * the offline [[ClassifierOps.train]] run, the train-offline /
    * score-online lifecycle.
    */
  def prepared(docs: DataFrame, w: Array[Double], b: Double,
               minScore: Double = 0.5,
               threshold: Double = 0.5,
               maxBucket: Int = DedupOps.MaxBucket): Dataset[PrepVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val clean = flagged(docs)
      .filter(size(col("rules")) === 0).drop("rules")
    // minScore is an offline-calibrated CONSTANT (the deployment picks it
    // from the trained model's score distribution, the same way w and b
    // arrive) — a stream cannot threshold on a quantile of its own future
    val good = ClassifierOps.withScore(clean, w, b)
      .filter(col("score") >= minScore)
      .select(col("doc_id"), col("text"))
    NearDupStream.banded(good)
      .groupByKey(r => (r.band_id, r.band_hash))
      .transformWithState(
        new VerdictProcessor(threshold, maxBucket),
        TimeMode.None(),
        OutputMode.Append())
  }
}
