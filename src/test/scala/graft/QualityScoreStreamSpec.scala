package graft

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.DataFrame

import graft.ops.ClassifierOps
import graft.streaming.QualityScoreStream

/** Train-offline / score-online parity: the model trained on the batch
  * corpus scores the SAME documents streamed through a MemoryStream, and
  * every (doc_id → label, score, pred, split) row must be BIT-IDENTICAL
  * to the batch `quality_classifier` output — the scoring projection is
  * stateless and shared, so there is no tolerance to grant.
  */
class QualityScoreStreamSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("streamed scores are bit-identical to the batch classifier output") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // batch reference AND the trained model (same training run shape)
    val batch = SparkEntry.queries("quality_classifier")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2),
        r.getBoolean(3), r.getString(4)))).toMap
    val (w, b, _, _) = ClassifierOps.train(spark, sf)

    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    val input = MemoryStream[(Long, String, String)]
    val scoredStream = QualityScoreStream.scored(
      input.toDF().toDF("doc_id", "text", "lang"), w, b)
    assert(scoredStream.isStreaming, "scorer must accept a streaming frame")

    val out = mutable.Map[Long, (Int, Double, Boolean, String)]()
    val query = scoredStream.writeStream
      .outputMode("append")
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.collect().foreach { r =>
          out(r.getLong(0)) =
            ((r.getInt(1), r.getDouble(2), r.getBoolean(3), r.getString(4)))
        }
        ()
      }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("qscore_ckpt").toString)
      .start()
    try {
      // two micro-batches — scoring is stateless, so batching must not matter
      val (first, second) = docs.splitAt(docs.length / 2)
      input.addData(first.toSeq)
      query.processAllAvailable()
      input.addData(second.toSeq)
      query.processAllAvailable()
    } finally query.stop()

    assert(out.size == batch.size, s"${out.size} streamed vs ${batch.size} batch")
    batch.foreach { case (id, expect) =>
      assert(out(id) == expect, s"doc $id: stream ${out(id)} vs batch $expect")
    }
  }
}
