package graft

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.DataFrame

import graft.streaming.PreferencePairsStream

/** Batch/stream parity for the preference-pair miner: the same documents
  * streamed through a MemoryStream in two micro-batches must settle on
  * state BIT-IDENTICAL to the batch `preference_pairs` output — the
  * score projection and min_by/max_by aggregation are shared code, so
  * there is no tolerance to grant. Additionally the MID-stream state
  * (after only the first micro-batch) must equal a batch run over that
  * prefix: running extremes are prefix-decomposable, which is what makes
  * the update-mode service correct at every instant, not only at drain.
  */
class PreferencePairsStreamSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private type PairRow = (Long, Long, Long, Long, Long, Long)

  private def collectPairs(df: DataFrame): Map[(String, String), PairRow] =
    df.collect().map { r =>
      (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        ((r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id"),
          r.getAs[Long]("chosen_score"), r.getAs[Long]("rejected_score"),
          r.getAs[Long]("margin"), r.getAs[Long]("n_candidates")))
    }.toMap

  test("settled stream state is bit-identical to batch; prefix state matches prefix batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    val (first, second) = docs.splitAt(docs.length / 2)

    def batchOn(rows: Array[(Long, String, String, String, Long)]) =
      collectPairs(PreferencePairsStream.pairs(
        rows.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")))

    val input = MemoryStream[(Long, String, String, String, Long)]
    val stream = PreferencePairsStream.pairs(
      input.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"))
    assert(stream.isStreaming, "miner must accept a streaming frame")

    // update mode: keep the LAST emission per group
    val out = mutable.Map[(String, String), PairRow]()
    val query = stream.writeStream
      .outputMode("update")
      .foreachBatch { (df: DataFrame, _: Long) =>
        collectPairs(df).foreach { case (k, v) => out(k) = v }
        ()
      }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("prefpairs_ckpt").toString)
      .start()
    try {
      input.addData(first.toSeq)
      query.processAllAvailable()
      // prefix invariant: mid-stream state == batch over the prefix.
      // NOTE: `out` may hold groups whose pair later UN-gated (update mode
      // never retracts), but after only one batch nothing has un-gated —
      // gates are monotone in new data only for n_candidates, while margin
      // can only grow (extremes are monotone), so prefix equality is exact.
      assert(out.toMap == batchOn(first), "prefix state diverged from prefix batch")
      input.addData(second.toSeq)
      query.processAllAvailable()
    } finally query.stop()

    val batchAll = batchOn(docs)
    // update mode can leave a stale row for a group that was once gated-in
    // and never re-emitted; both gates are MONOTONE (count grows, margin
    // grows with running extremes), so once gated-in a group stays in and
    // its final emission is its final state — out must equal batch exactly
    assert(out.toMap == batchAll,
      s"settled stream state diverged: only-stream=${out.keySet -- batchAll.keySet} " +
        s"only-batch=${batchAll.keySet -- out.keySet}")
    // parity with the registry batch op on the full fixture
    val registry = collectPairs(SparkEntry.queries("preference_pairs")(spark, sf))
    assert(batchAll == registry, "shared builders diverged from the registry op")
  }
}
