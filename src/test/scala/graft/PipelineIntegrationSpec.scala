package graft

import java.sql.DriverManager

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{JdbcUpsertSink, OhlcvStream}

/** End-to-end parity: the ENTIRE reference pipeline as one flow — JSON
  * lines (with duplicate trade_ids, a malformed line, and a too-late row)
  * → permissive parse → watermarked dedup → 1-min OHLCV+VWAP → update-mode
  * foreachBatch → transactional JDBC key-upsert — asserted against
  * hand-computed rows in the sink database, across multiple micro-batches
  * including a replayed refinement.
  */
class PipelineIntegrationSpec extends SparkSuite {

  private val T0 = 1705276800000L // 2024-01-15 00:00:00 UTC

  private def jsonTrade(id: Long, sym: String, price: String, qty: String,
                        epochMs: Long): String =
    s"""{"trade_id":$id,"symbol":"$sym","price":"$price","quantity":"$qty","trade_time":$epochMs,"is_buyer_maker":false}"""

  test("JSON → dedup → OHLCV → JDBC upsert, end to end") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val url = "jdbc:derby:memory:graftPipeline;create=true"
    val conn = DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      """CREATE TABLE trades_1min_agg (
        |  "window_start" TIMESTAMP NOT NULL,
        |  "window_end" TIMESTAMP NOT NULL,
        |  "symbol" VARCHAR(16) NOT NULL,
        |  "open_price" DOUBLE, "high_price" DOUBLE, "low_price" DOUBLE,
        |  "close_price" DOUBLE, "total_volume" DOUBLE, "vwap" DOUBLE,
        |  PRIMARY KEY ("symbol", "window_start"))""".stripMargin)
    conn.close()

    val input = MemoryStream[String]
    val agg = OhlcvStream.ohlcvWatermarked(
      OhlcvStream.dedupTrades(
        OhlcvStream.parseTrades(input.toDF().select(col("value").as("json")))))
      // double-cast at the sink boundary: the reference's NUMERIC(20,8)
      // column set, flattened to DOUBLE for the embedded test database
      .select(col("window_start"), col("window_end"), col("symbol"),
        col("open_price").cast("double"), col("high_price").cast("double"),
        col("low_price").cast("double"), col("close_price").cast("double"),
        col("total_volume").cast("double"), col("vwap").cast("double"))
    val sink = JdbcUpsertSink.upsert(url, "trades_1min_agg",
      Seq("window_start", "symbol"))
    val query = agg.writeStream
      .outputMode("update")
      .foreachBatch(sink)
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("pipe_ckpt").toString)
      .start()
    try {
      input.addData(Seq(
        jsonTrade(1, "BTCUSDT", "100.0", "2", T0 + 10000),
        jsonTrade(1, "BTCUSDT", "100.0", "2", T0 + 10000), // duplicate: dropped
        jsonTrade(2, "BTCUSDT", "110.0", "1", T0 + 40000),
        "this is not json",                                 // malformed: null row
        jsonTrade(3, "ETHUSDT", "10.0", "5", T0 + 20000)))
      query.processAllAvailable()
      input.addData(Seq(
        jsonTrade(4, "BTCUSDT", "90.0", "1", T0 + 50000),  // refines the window
        jsonTrade(5, "BTCUSDT", "50.0", "1", T0 + 400000))) // advances watermark
      query.processAllAvailable()
      input.addData(Seq(
        jsonTrade(6, "BTCUSDT", "999.0", "9", T0 + 30000))) // too late: dropped
      query.processAllAvailable()
    } finally query.stop()

    val rows = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "trades_1min_agg").load()
      .collect()
      .map(r => (r.getAs[String]("symbol"),
        r.getAs[java.sql.Timestamp]("window_start").getTime,
        r.getAs[Double]("open_price"), r.getAs[Double]("high_price"),
        r.getAs[Double]("low_price"), r.getAs[Double]("close_price"),
        r.getAs[Double]("total_volume"), r.getAs[Double]("vwap")))
      .toSet
    // BTC window [00:00,00:01): trades 100×2, 110×1, 90×1 (dup + late dropped)
    //   open 100, high 110, low 90, close 90, vol 4, vwap (200+110+90)/4 = 100
    // ETH window: single 10×5
    // BTC window [00:06,00:07): single 50×1
    assert(rows == Set(
      ("BTCUSDT", T0, 100.0, 110.0, 90.0, 90.0, 4.0, 100.0),
      ("ETHUSDT", T0, 10.0, 10.0, 10.0, 10.0, 5.0, 10.0),
      ("BTCUSDT", T0 + 360000, 50.0, 50.0, 50.0, 50.0, 1.0, 50.0)),
      s"unexpected sink contents: $rows")
  }
}
