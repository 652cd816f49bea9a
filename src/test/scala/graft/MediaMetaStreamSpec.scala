package graft

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.DataFrame

import graft.streaming.MediaMetaStream

/** Streaming/batch parity for the video lane: the REAL encode→AVI-parse
  * map streamed through a MemoryStream must produce rows BIT-IDENTICAL
  * to the batch `video_meta` output — across micro-batch splits AND a
  * checkpoint restart mid-corpus — and the update-mode codec census must
  * settle on the batch census.
  */
class MediaMetaStreamSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def docRows: Array[(Long, String)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

  test("streamed video_meta rows are bit-identical to batch, across a checkpoint restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = SparkEntry.queries("video_meta")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getLong(5)))).toMap
    val docs = docRows
    val ckpt = java.nio.file.Files.createTempDirectory("mmeta_ckpt").toString
    val out = mutable.Map[Long, (String, Int, Int, Int, Long)]()

    val input = MemoryStream[(Long, String)]
    val rows = MediaMetaStream.metaRows(input.toDF().toDF("doc_id", "text"))
    assert(rows.isStreaming, "metaRows must accept a streaming frame")
    def start() = rows.writeStream
      .outputMode("append")
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.collect().foreach { r =>
          out(r.getLong(0)) = ((r.getString(1), r.getInt(2), r.getInt(3),
            r.getInt(4), r.getLong(5)))
        }
        ()
      }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation", ckpt)
      .start()

    val (first, second) = docs.splitAt(docs.length / 2)
    val q1 = start()
    try { input.addData(first.toSeq); q1.processAllAvailable() }
    finally q1.stop()
    // RESTART against the same checkpoint: the second half arrives after
    // a process death; offsets resume, no row is lost or duplicated (the
    // keyed sink makes any replayed batch idempotent)
    val q2 = start()
    try { input.addData(second.toSeq); q2.processAllAvailable() }
    finally q2.stop()

    assert(out.size == batch.size, s"${out.size} streamed vs ${batch.size} batch")
    batch.foreach { case (id, e) =>
      assert(out(id) == e, s"doc $id: stream ${out(id)} vs batch $e")
    }
    assert(out.values.forall(_._1 == "mjpeg"), "quarantine fired on clean fixtures")
  }

  test("update-mode codec census settles on the batch census") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batchCensus = MediaMetaStream.codecCensus(
      SparkEntry.queries("video_meta")(spark, sf)).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

    val input = MemoryStream[(Long, String)]
    val census = MediaMetaStream.codecCensus(
      MediaMetaStream.metaRows(input.toDF().toDF("doc_id", "text")))
    val latest = mutable.Map[(String, Int), (Long, Long, Long)]()
    val query = census.writeStream
      .outputMode("update")
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.collect().foreach { r =>
          latest((r.getString(0), r.getInt(1))) =
            ((r.getLong(2), r.getLong(3), r.getLong(4)))
        }
        ()
      }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("mmeta_census_ckpt").toString)
      .start()
    try {
      val (first, second) = docRows.splitAt(docRows.length / 3)
      input.addData(first.toSeq)
      query.processAllAvailable()
      input.addData(second.toSeq)
      query.processAllAvailable()
    } finally query.stop()

    assert(latest.toMap == batchCensus,
      s"final census ${latest.toMap} vs batch $batchCensus")
    assert(batchCensus.size > 1, "census has one key — fps spread vacuous")
  }

  test("streamed av_sync rows are bit-identical to batch, across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = SparkEntry.queries("av_sync_check")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val input = MemoryStream[(Long, String)]
    val rows = MediaMetaStream.avRows(input.toDF().toDF("doc_id", "text"))
    assert(rows.isStreaming, "avRows must accept a streaming frame")
    val out = mutable.Map[Long, Seq[Any]]()
    val query = rows.writeStream
      .outputMode("append")
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.collect().foreach(r => out(r.getLong(0)) = r.toSeq.tail)
        ()
      }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("av_ckpt").toString)
      .start()
    try {
      val (first, second) = docRows.splitAt(docRows.length / 2)
      input.addData(first.toSeq)
      query.processAllAvailable()
      input.addData(second.toSeq)
      query.processAllAvailable()
    } finally query.stop()
    assert(out.size == batch.size, s"${out.size} streamed vs ${batch.size} batch")
    batch.foreach { case (id, e) =>
      assert(out(id) == e, s"doc $id: stream ${out(id)} vs batch $e")
    }
    // non-vacuity even at sf0.001: both sync classes occur
    assert(out.values.exists(_.last == true) && out.values.exists(_.last == false),
      "fixture never crosses the sync threshold — drift jitter vacuous")
  }

  test("update-mode A/V census settles on the batch census, audio columns real") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batchAv = SparkEntry.queries("av_sync_check")(spark, sf)
    val batchCensus = MediaMetaStream.avCensus(batchAv).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val input = MemoryStream[(Long, String)]
    val census = MediaMetaStream.avCensus(
      MediaMetaStream.avRows(input.toDF().toDF("doc_id", "text")))
    val latest = mutable.Map[(String, Int, Int), (Long, Long, Long, Long)]()
    val query = census.writeStream
      .outputMode("update")
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.collect().foreach { r =>
          latest((r.getString(0), r.getInt(1), r.getInt(2))) =
            ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
        }
        ()
      }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("av_census_ckpt").toString)
      .start()
    try {
      val (first, second) = docRows.splitAt(docRows.length / 3)
      input.addData(first.toSeq)
      query.processAllAvailable()
      input.addData(second.toSeq)
      query.processAllAvailable()
    } finally query.stop()
    assert(latest.toMap == batchCensus,
      s"final census ${latest.toMap} vs batch $batchCensus")
    assert(batchCensus.size > 1, "A/V census has one key — ladder vacuous")
    assert(batchCensus.values.exists(_._4 > 0L),
      "no out-of-sync items counted — the monitor column is vacuous")
  }
}
