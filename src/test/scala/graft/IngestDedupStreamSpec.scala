package graft

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.DataFrame

import graft.streaming.{IngestDedupStream, OhlcvStream}

/** The streaming exact-ingest-dedup contract, pinned branch by branch:
  * within-horizon replays drop via dedup state, original-time replays of
  * EXPIRED ids drop via the late filter (so identical-payload replays can
  * never double-emit), a restamped above-watermark re-send of an expired
  * id passes through (the bounded contract, stated honestly), the query
  * resumes dedup state across a checkpoint restart, and the settled
  * output of a within-horizon prefix equals batch dropDuplicates on the
  * same rows.
  */
class IngestDedupStreamSpec extends SparkSuite {

  private def jsonTrade(id: Long, sym: String, price: String, qty: String,
                        epochMs: Long): String =
    s"""{"trade_id":$id,"symbol":"$sym","price":"$price","quantity":"$qty","trade_time":$epochMs,"is_buyer_maker":false}"""

  private val T0 = 1705276800000L // 2024-01-15 00:00:00 UTC
  private val Min = 60000L

  private def startQuery(input: MemoryStream[String], ckpt: String,
                         out: mutable.Buffer[Seq[Long]]) =
    IngestDedupStream.deduped(
      OhlcvStream.parseTrades(input.toDF().select(col("value").as("json"))))
      .writeStream
      .outputMode("append")
      .foreachBatch { (df: DataFrame, _: Long) =>
        val ids = df.collect().map(_.getAs[Long]("trade_id")).toSeq.sorted
        if (ids.nonEmpty) out += ids
        ()
      }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation", ckpt)
      .start()

  test("within-horizon replays drop; expired original-time replays drop late; restamped re-sends pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val out = mutable.Buffer[Seq[Long]]()
    val ckpt = java.nio.file.Files.createTempDirectory("ingest_dedup").toString
    val q = startQuery(input, ckpt, out)
    try {
      input.addData(Seq(
        jsonTrade(1, "BTCUSDT", "100.0", "1", T0),
        jsonTrade(2, "BTCUSDT", "101.0", "1", T0 + 1000)))
      q.processAllAvailable()
      // branch 1: replay of id 1 WITHIN the 2-minute horizon → dedup state
      input.addData(Seq(
        jsonTrade(1, "BTCUSDT", "100.0", "1", T0),
        jsonTrade(3, "BTCUSDT", "102.0", "1", T0 + 30000)))
      q.processAllAvailable()
      // advance the watermark to T0+8min: id 1's state (expiry T0+2min)
      // is evicted once this batch commits
      input.addData(Seq(jsonTrade(4, "BTCUSDT", "103.0", "1", T0 + 10 * Min)))
      q.processAllAvailable()
      // branch 2: original-time replay of the EXPIRED id 1 is below the
      // watermark → late-dropped, NOT re-emitted.
      // branch 3: id 1 restamped above the watermark (send-time stamping
      // on retry) → state is gone, passes through as a fresh row.
      input.addData(Seq(
        jsonTrade(1, "BTCUSDT", "100.0", "1", T0),
        jsonTrade(1, "BTCUSDT", "100.0", "1", T0 + 9 * Min),
        jsonTrade(5, "BTCUSDT", "104.0", "1", T0 + 9 * Min + 1000)))
      q.processAllAvailable()
    } finally q.stop()
    assert(out.flatten.count(_ == 1L) == 2,
      s"id 1 must emit exactly twice (first seen + past-horizon restamp): $out")
    assert(out == Seq(Seq(1L, 2L), Seq(3L), Seq(4L), Seq(1L, 5L)), s"got $out")
  }

  test("dedup state survives a checkpoint restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val out = mutable.Buffer[Seq[Long]]()
    val ckpt = java.nio.file.Files.createTempDirectory("ingest_dedup_rs").toString
    val q1 = startQuery(input, ckpt, out)
    try {
      input.addData(Seq(
        jsonTrade(10, "ETHUSDT", "10.0", "2", T0),
        jsonTrade(11, "ETHUSDT", "10.5", "2", T0 + 5000)))
      q1.processAllAvailable()
    } finally q1.stop()
    // replay of id 10 lands while no query runs; the restarted query must
    // still drop it from restored state
    input.addData(Seq(
      jsonTrade(10, "ETHUSDT", "10.0", "2", T0),
      jsonTrade(12, "ETHUSDT", "11.0", "2", T0 + 8000)))
    val q2 = startQuery(input, ckpt, out)
    try q2.processAllAvailable() finally q2.stop()
    assert(out.flatten == Seq(10L, 11L, 12L), s"got $out")
  }

  test("settled within-horizon prefix equals batch dropDuplicates over the same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lines = Seq(
      Seq(jsonTrade(1, "BTCUSDT", "100.0", "1", T0),
        jsonTrade(1, "BTCUSDT", "100.0", "1", T0), // same-batch dup
        jsonTrade(2, "BTCUSDT", "101.0", "3", T0 + 2000)),
      Seq(jsonTrade(2, "BTCUSDT", "101.0", "3", T0 + 2000), // cross-batch dup
        jsonTrade(3, "ETHUSDT", "10.0", "5", T0 + 4000)))
    val input = MemoryStream[String]
    val got = mutable.Buffer[(Long, String, String, String)]()
    val q = IngestDedupStream.deduped(
      OhlcvStream.parseTrades(input.toDF().select(col("value").as("json"))))
      .writeStream.outputMode("append")
      .foreachBatch { (df: DataFrame, _: Long) =>
        got ++= df.collect().map(r => (r.getAs[Long]("trade_id"),
          r.getAs[String]("symbol"), r.getAs[java.math.BigDecimal]("price").toPlainString,
          r.getAs[java.sql.Timestamp]("trade_time").toString))
        ()
      }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ingest_dedup_bt").toString)
      .start()
    try {
      lines.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val batchTwin = OhlcvStream.parseTrades(
        lines.flatten.toDF("json").select(col("json")))
      .dropDuplicates("trade_id")
      .collect().map(r => (r.getAs[Long]("trade_id"),
        r.getAs[String]("symbol"), r.getAs[java.math.BigDecimal]("price").toPlainString,
        r.getAs[java.sql.Timestamp]("trade_time").toString)).toSet
    assert(got.toSet == batchTwin && got.size == batchTwin.size,
      s"streamed ${got.toSet} vs batch $batchTwin")
  }
}
