package graft

import java.sql.{DriverManager, Timestamp}
import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, Row}

import graft.streaming.{JdbcUpsertSink, OhlcvStream}

/** Streaming-parity specs (SURVEY.md §2.4): watermarked windowed OHLCV/VWAP
  * semantics, late-data handling, malformed input, idempotent JDBC upsert,
  * and the ≥1k events/s single-core-equivalent throughput bar (BASELINE.md).
  */
class OhlcvStreamSpec extends SparkSuite {

  private def jsonTrade(id: Long, sym: String, price: String, qty: String,
                        epochMs: Long): String =
    s"""{"trade_id":$id,"symbol":"$sym","price":"$price","quantity":"$qty","trade_time":$epochMs,"is_buyer_maker":false}"""

  private val T0 = 1705276800000L // 2024-01-15 00:00:00 UTC

  /** Run a streaming OHLCV query over batches of JSON lines, collecting
    * update-mode output per (window_start, symbol) — last write wins, like
    * the reference's key upsert.
    */
  private def runStream(batches: Seq[Seq[String]]): Map[(Timestamp, String), Row] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val agg = OhlcvStream.ohlcv(
      OhlcvStream.parseTrades(input.toDF().select(col("value").as("json"))))
    val out = mutable.Map[(Timestamp, String), Row]()
    val query = agg.writeStream
      .outputMode("update")
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.collect().foreach { r =>
          out((r.getAs[Timestamp]("window_start"), r.getAs[String]("symbol"))) = r
        }
      }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ohlcv_ckpt").toString)
      .start()
    try {
      batches.foreach { b =>
        input.addData(b)
        query.processAllAvailable()
      }
    } finally query.stop()
    out.toMap
  }

  test("OHLCV window aggregation matches hand-computed values") {
    val rows = runStream(Seq(Seq(
      jsonTrade(1, "BTCUSDT", "100.5", "2", T0 + 10000), // 00:00:10
      jsonTrade(2, "BTCUSDT", "103.0", "1", T0 + 20000), // 00:00:20
      jsonTrade(3, "BTCUSDT", "99.0", "4", T0 + 50000),  // 00:00:50
      jsonTrade(4, "BTCUSDT", "101.0", "1", T0 + 70000), // 00:01:10 (next window)
      jsonTrade(5, "ETHUSDT", "10.0", "3", T0 + 15000))))
    val btc = rows((new Timestamp(T0), "BTCUSDT"))
    assert(btc.getAs[java.math.BigDecimal]("open_price").doubleValue() == 100.5)
    assert(btc.getAs[java.math.BigDecimal]("high_price").doubleValue() == 103.0)
    assert(btc.getAs[java.math.BigDecimal]("low_price").doubleValue() == 99.0)
    assert(btc.getAs[java.math.BigDecimal]("close_price").doubleValue() == 99.0)
    assert(btc.getAs[java.math.BigDecimal]("total_volume").doubleValue() == 7.0)
    // vwap = (100.5*2 + 103*1 + 99*4) / 7 = 700/7 = 100
    assert(math.abs(btc.getAs[java.math.BigDecimal]("vwap").doubleValue() - 100.0) < 1e-9)
    assert(rows.contains((new Timestamp(T0 + 60000), "BTCUSDT")))
    assert(rows((new Timestamp(T0), "ETHUSDT"))
      .getAs[java.math.BigDecimal]("total_volume").doubleValue() == 3.0)
  }

  test("update mode refines a window across micro-batches") {
    val rows = runStream(Seq(
      Seq(jsonTrade(1, "BTCUSDT", "100.0", "1", T0 + 1000)),
      Seq(jsonTrade(2, "BTCUSDT", "110.0", "1", T0 + 2000))))
    val btc = rows((new Timestamp(T0), "BTCUSDT"))
    assert(btc.getAs[java.math.BigDecimal]("total_volume").doubleValue() == 2.0)
    assert(btc.getAs[java.math.BigDecimal]("close_price").doubleValue() == 110.0)
  }

  test("rows later than the watermark are dropped (reference: 2-minute bound)") {
    val rows = runStream(Seq(
      // batch 1: window [00:00, 00:01) plus an event at 00:05 that advances
      // the watermark to 00:03 — past the first window's end
      Seq(
        jsonTrade(1, "BTCUSDT", "100.0", "1", T0 + 1000),
        jsonTrade(2, "BTCUSDT", "200.0", "1", T0 + 300000)),
      // batch 2: late arrival for the evicted [00:00, 00:01) window
      Seq(jsonTrade(3, "BTCUSDT", "999.0", "9", T0 + 30000))))
    val first = rows((new Timestamp(T0), "BTCUSDT"))
    assert(first.getAs[java.math.BigDecimal]("total_volume").doubleValue() == 1.0,
      "late row must not refine an evicted window")
    assert(first.getAs[java.math.BigDecimal]("high_price").doubleValue() == 100.0)
  }

  test("malformed JSON parses to NULL fields (PERMISSIVE, reference schema declared nullable)") {
    import spark.implicits._
    val parsed = OhlcvStream.parseTrades(
      Seq("not json at all", jsonTrade(1, "BTCUSDT", "1.0", "1", T0))
        .toDF("json"))
    val rows = parsed.collect()
    assert(rows.length == 2)
    assert(rows.count(_.isNullAt(parsed.columns.indexOf("symbol"))) == 1)
  }

  test("JDBC upsert sink is idempotent and refines on key conflict") {
    import spark.implicits._
    val url = "jdbc:derby:memory:graftUpsert;create=true"
    val conn = DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      """CREATE TABLE ohlcv_agg (
        |  "window_start" TIMESTAMP NOT NULL,
        |  "symbol" VARCHAR(16) NOT NULL,
        |  "close_price" DOUBLE,
        |  "total_volume" DOUBLE,
        |  PRIMARY KEY ("symbol", "window_start"))""".stripMargin)
    conn.close()
    val sink = JdbcUpsertSink.upsert(url, "ohlcv_agg", Seq("window_start", "symbol"))
    val batch1 = Seq(
      (new Timestamp(T0), "BTCUSDT", 100.0, 1.0),
      (new Timestamp(T0), "ETHUSDT", 10.0, 2.0))
      .toDF("window_start", "symbol", "close_price", "total_volume")
    sink(batch1, 0L)
    sink(batch1, 1L) // replay after simulated recovery — must converge
    val refined = Seq((new Timestamp(T0), "BTCUSDT", 110.0, 3.0))
      .toDF("window_start", "symbol", "close_price", "total_volume")
    sink(refined, 2L)
    val got = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "ohlcv_agg").load()
      .collect().map(r => (r.getAs[String]("symbol"),
        r.getAs[Double]("close_price"), r.getAs[Double]("total_volume")))
      .toSet
    assert(got == Set(("BTCUSDT", 110.0, 3.0), ("ETHUSDT", 10.0, 2.0)))
  }

  test("dropDuplicatesWithinWatermark dedups replayed trade_ids across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val deduped = OhlcvStream.dedupTrades(
      OhlcvStream.parseTrades(input.toDF().select(col("value").as("json"))))
    val out = mutable.Buffer[Long]()
    val query = deduped.writeStream
      .outputMode("append")
      .foreachBatch { (df: DataFrame, _: Long) =>
        out ++= df.collect().map(_.getAs[Long]("trade_id"))
        ()
      }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("dedup_ckpt").toString)
      .start()
    try {
      input.addData(Seq(
        jsonTrade(1, "BTCUSDT", "100.0", "1", T0 + 1000),
        jsonTrade(1, "BTCUSDT", "100.0", "1", T0 + 1000), // same-batch dup
        jsonTrade(2, "BTCUSDT", "101.0", "1", T0 + 2000)))
      query.processAllAvailable()
      input.addData(Seq(
        jsonTrade(2, "BTCUSDT", "101.0", "1", T0 + 2000), // cross-batch dup
        jsonTrade(3, "BTCUSDT", "102.0", "1", T0 + 3000)))
      query.processAllAvailable()
    } finally query.stop()
    assert(out.sorted == Seq(1L, 2L, 3L), s"got $out")
  }

  test("stream sustains >= 1k events/s end-to-end (BASELINE.md parity bar)") {
    val n = 100000
    val syms = Array("BTCUSDT", "ETHUSDT", "SOLUSDT", "XRPUSDT")
    val events = (0 until n).map { i =>
      jsonTrade(i.toLong, syms(i % 4), s"${100 + i % 50}.${i % 100}", "1",
        T0 + (i.toLong * 1800000 / n)) // spread over 30 min
    }
    val t0 = System.nanoTime()
    val rows = runStream(Seq(events))
    val secs = (System.nanoTime() - t0) / 1e9
    val rate = n / secs
    info(f"throughput: $rate%.0f events/s over $n events in $secs%.1f s")
    assert(rows.nonEmpty)
    assert(rate >= 1000.0, f"expected >= 1000 events/s, got $rate%.0f")
  }
}
