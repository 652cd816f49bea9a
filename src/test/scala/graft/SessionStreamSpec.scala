package graft

import java.sql.Timestamp
import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.DataFrame

import graft.streaming.{OhlcvStream, SessionStream}

/** Streaming session-window semantics: gap-based session split, late-event
  * session MERGE (the behavior fixed windows cannot express), append-mode
  * exactly-once emission on watermark close, and deterministic aggregates.
  */
class SessionStreamSpec extends SparkSuite {

  private def jsonTrade(id: Long, sym: String, price: String, qty: String,
                        epochMs: Long): String =
    s"""{"trade_id":$id,"symbol":"$sym","price":"$price","quantity":"$qty","trade_time":$epochMs,"is_buyer_maker":false}"""

  private val T0 = 1705276800000L // 2024-01-15 00:00:00 UTC

  /** Run batches through the session aggregation in APPEND mode; each
    * emitted row is a CLOSED session (watermark passed its end). The last
    * batch should carry a far-future watermark-advancing event to flush.
    */
  private def runSessions(batches: Seq[Seq[String]]): Seq[(Timestamp, Timestamp, String, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val agg = SessionStream.sessions(
      OhlcvStream.parseTrades(input.toDF().select(col("value").as("json"))),
      gap = "30 seconds", watermark = "2 minutes")
    val out = mutable.ArrayBuffer[(Timestamp, Timestamp, String, Long)]()
    val query = agg.writeStream
      .outputMode("append")
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.collect().foreach { r =>
          out += ((r.getAs[Timestamp]("session_start"),
            r.getAs[Timestamp]("session_end"),
            r.getAs[String]("symbol"),
            r.getAs[Long]("n_trades")))
        }
      }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sess_ckpt").toString)
      .start()
    try {
      batches.foreach { b =>
        input.addData(b)
        query.processAllAvailable()
      }
    } finally query.stop()
    out.toSeq
  }

  private def ts(ms: Long) = new Timestamp(ms)

  test("gap splits sessions; session end = last event + gap") {
    val got = runSessions(Seq(
      Seq(
        jsonTrade(1, "BTCUSDT", "100", "1", T0),
        jsonTrade(2, "BTCUSDT", "101", "1", T0 + 10000),  // same session
        jsonTrade(3, "BTCUSDT", "102", "1", T0 + 60000)), // > 30s idle → new session
      Seq(jsonTrade(99, "ZZZ", "1", "1", T0 + 600000))    // watermark flush
    ))
    val btc = got.filter(_._3 == "BTCUSDT").sortBy(_._1.getTime)
    assert(btc == Seq(
      (ts(T0), ts(T0 + 40000), "BTCUSDT", 2L),           // [00, last 10s + 30s gap)
      (ts(T0 + 60000), ts(T0 + 90000), "BTCUSDT", 1L)))
  }

  test("a bridging event MERGES two open sessions into one") {
    val got = runSessions(Seq(
      Seq(
        jsonTrade(1, "BTCUSDT", "100", "1", T0),
        jsonTrade(2, "BTCUSDT", "102", "1", T0 + 50000)), // two open sessions
      Seq(jsonTrade(3, "BTCUSDT", "101", "1", T0 + 25000)), // bridges the gap
      Seq(jsonTrade(99, "ZZZ", "1", "1", T0 + 600000))
    ))
    val btc = got.filter(_._3 == "BTCUSDT")
    assert(btc == Seq((ts(T0), ts(T0 + 80000), "BTCUSDT", 3L)),
      s"expected one merged session, got $btc")
  }

  test("sessions are per-symbol and aggregates are deterministic VWAP/open/close") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val agg = SessionStream.sessions(
      OhlcvStream.parseTrades(input.toDF().select(col("value").as("json"))),
      gap = "30 seconds", watermark = "2 minutes")
    val rows = mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val query = agg.writeStream
      .outputMode("append")
      .foreachBatch { (df: DataFrame, _: Long) => rows ++= df.collect(); () }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sess_ckpt").toString)
      .start()
    try {
      input.addData(Seq(
        jsonTrade(2, "BTCUSDT", "103.0", "1", T0 + 2000), // out-of-order ids
        jsonTrade(1, "BTCUSDT", "100.5", "2", T0 + 1000),
        jsonTrade(3, "ETHUSDT", "10", "5", T0 + 1000)))
      query.processAllAvailable()
      input.addData(Seq(jsonTrade(99, "ZZZ", "1", "1", T0 + 600000)))
      query.processAllAvailable()
    } finally query.stop()
    val bySym = rows.map(r => r.getAs[String]("symbol") -> r).toMap
    val btc = bySym("BTCUSDT")
    assert(btc.getAs[java.math.BigDecimal]("open_price").doubleValue() == 100.5)
    assert(btc.getAs[java.math.BigDecimal]("close_price").doubleValue() == 103.0)
    assert(btc.getAs[java.math.BigDecimal]("total_volume").doubleValue() == 3.0)
    // vwap = (100.5*2 + 103*1) / 3
    assert(math.abs(btc.getAs[java.math.BigDecimal]("vwap").doubleValue() - 304.0 / 3) < 1e-6)
    assert(bySym("ETHUSDT").getAs[Long]("n_trades") == 1L)
  }
}
