package graft

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, Row}

import graft.ops.{ClassifierOps, DedupOps}
import graft.streaming.{CorpusPrepStream, NearDupStream}

/** The streaming prep capstone's equality contract: the real documents
  * corpus, replayed through the composed rule-split → quality-threshold →
  * LSH-verdict topology across micro-batches WITH a checkpoint restart,
  * must yield exactly the batch pipeline's surviving doc set
  * (corpus_clean's lang/token filters ∘ score ≥ 0.5 ∘ first-seen
  * near-dup). The near-dup ground truth is a single-threaded sequential
  * replay of the capped-bucket first-seen index — plain Scala over
  * collected signatures, no Spark state machinery.
  */
class CorpusPrepStreamSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("stream survivors equal the batch clean ∘ quality ∘ first-seen-dedup set across a restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    val docs = docsDf.collect()
      .map(r => CorpusPrepStream.PrepDoc(r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_.doc_id)
    val (w, b, _, _) = ClassifierOps.train(spark, sf)

    // ---- batch side: the composition target, via the BATCH ops ----
    // stage 1+2 (stateless): corpus_clean's lang/token filters, then the
    // same broadcast-literal scoring — batch and stream are the same
    // projection, so using it here is not circular: what the spec pins is
    // the STATEFUL stage 3 equality plus end-to-end composition.
    val scoredClean = ClassifierOps.withScore(
      CorpusPrepStream.flagged(docsDf).filter(size(col("rules")) === 0), w, b)
    // offline threshold calibration (the production shape: the constant
    // ships with the weights): exact median of the clean-doc scores, so
    // the quality gate drops ~half — non-vacuous in both directions
    val scores = scoredClean.select("score").collect().map(_.getDouble(0)).sorted
    val minScore = scores(scores.length / 2)
    val qualityIds = scoredClean
      .filter(col("score") >= minScore)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(qualityIds.nonEmpty && qualityIds.size < docs.length,
      "filters must drop something and keep something or the spec is vacuous")

    // stage 3 ground truth: sequential first-seen capped-bucket index in
    // plain Scala over signatures collected from the stateless banding
    val bandRows = NearDupStream.banded(
        docsDf.filter(col("doc_id").isInCollection(qualityIds))).collect()
    val byDoc = bandRows.groupBy(_.doc_id).toSeq.sortBy(_._1)
    val buckets = mutable.Map[(Int, Long), mutable.Buffer[(Long, Array[Long])]]()
    val flaggedIds = mutable.Set[Long]()
    for ((id, rows) <- byDoc) {
      var any = false
      for (r <- rows) {
        val bucket = buckets.getOrElseUpdate(
          (r.band_id, r.band_hash), mutable.Buffer.empty)
        if (bucket.exists(s => NearDupStream.estimate(r.sig, s._2) >= 0.5))
          any = true
        if (bucket.size < DedupOps.MaxBucket) bucket += ((id, r.sig))
      }
      if (any) flaggedIds += id
    }
    val batchSurvivors = qualityIds -- flaggedIds
    assert(flaggedIds.nonEmpty, "no near-dups among survivors — dedup leg vacuous")

    // ---- stream side: >= 2 micro-batches, checkpoint restart between ----
    val input = MemoryStream[CorpusPrepStream.PrepDoc]
    val verdicts = CorpusPrepStream.prepared(input.toDF(), w, b, minScore)
    val ck = java.nio.file.Files.createTempDirectory("prep_ckpt").toString
    val out = mutable.Buffer[Row]()
    def drain(): Unit = {
      val q = verdicts.toDF().writeStream
        .outputMode("append")
        .foreachBatch { (df: DataFrame, _: Long) => out ++= df.collect(); () }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ck)
        .start()
      q.awaitTermination()
    }
    val mid = docs(docs.length / 2).doc_id
    input.addData(docs.filter(_.doc_id < mid).toSeq)
    drain()
    input.addData(docs.filter(_.doc_id >= mid).toSeq)
    drain() // resumes from the checkpoint: bucket residency must be intact

    val matchedIds = out.filter(_.getAs[Boolean]("matched"))
      .map(_.getAs[Long]("doc_id")).toSet
    val allVerdictIds = out.map(_.getAs[Long]("doc_id")).toSet
    val streamSurvivors = allVerdictIds -- matchedIds

    // only clean+quality docs ever reach the verdict stage
    assert(allVerdictIds == qualityIds,
      s"verdict stage saw ${allVerdictIds.size} docs, stateless prefix passes ${qualityIds.size}")
    // the headline equality: composed stream == composed batch
    assert(streamSurvivors == batchSurvivors,
      s"stream-only=${streamSurvivors -- batchSurvivors} batch-only=${batchSurvivors -- streamSurvivors}")
    assert(matchedIds == flaggedIds)

    // the restart actually crossed state: some doc in batch 2 must have
    // matched a batch-1 resident (or the fixture split was degenerate)
    val crossBatch = out.exists(r => r.getAs[Boolean]("matched") &&
      r.getAs[Long]("doc_id") >= mid && r.getAs[Long]("dup_of") < mid)
    val hasCross = flaggedIds.exists(_ >= mid)
    assert(!hasCross || crossBatch, "cross-restart match lost at the checkpoint boundary")
  }

  test("the rule split quarantines crafted documents with their fired rule names") {
    import spark.implicits._
    val crafted = Seq(
      (1L, "valid document with more than five tokens here", "en"),
      (2L, "too short", "en"), // token_bounds
      (3L, "valid length document but unlisted language tokens", "zz"), // lang_allowed
      (4L, "nope", "zz") // both
    ).toDF("doc_id", "text", "lang")
    val got = CorpusPrepStream.flagged(crafted)
      .select(col("doc_id"), col("rules"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(got(1L) == Set.empty[String])
    assert(got(2L) == Set("token_bounds"))
    assert(got(3L) == Set("lang_allowed"))
    assert(got(4L) == Set("lang_allowed", "token_bounds"))
  }
}
