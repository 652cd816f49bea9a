package graft

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, Row}

import graft.streaming.OhlcvStream

/** The `observe()` ingest-metrics stage: per-micro-batch row / malformed /
  * bad-decimal counts must surface through StreamingQueryProgress WITHOUT
  * recomputing the batch (the reference's isEmpty+count guards run the
  * pipeline twice; observation rides the single existing pass).
  */
class ObservedMetricsSpec extends SparkSuite {

  private def jsonTrade(id: Long, sym: String, price: String, qty: String,
                        epochMs: Long): String =
    s"""{"trade_id":$id,"symbol":"$sym","price":"$price","quantity":"$qty","trade_time":$epochMs,"is_buyer_maker":false}"""

  private val T0 = 1705276800000L // 2024-01-15 00:00:00 UTC

  test("observe() reports per-batch ingest counts through query progress") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val agg = OhlcvStream.ohlcv(OhlcvStream.observed(
      OhlcvStream.parseTrades(input.toDF().select(col("value").as("json")))))
    val seen = mutable.ArrayBuffer[(Long, Long, Long)]()
    val query = agg.writeStream
      .outputMode("update")
      .foreachBatch { (df: DataFrame, _: Long) => df.count(); () }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("observe_ckpt").toString)
      .start()
    try {
      // batch 1: 3 good rows, 1 unparseable line, 1 non-numeric price
      input.addData(Seq(
        jsonTrade(1, "BTCUSDT", "100.5", "2", T0 + 1000),
        jsonTrade(2, "BTCUSDT", "101.0", "1", T0 + 2000),
        jsonTrade(3, "ETHUSDT", "10.0", "3", T0 + 3000),
        "this is not json",
        jsonTrade(4, "BTCUSDT", "not-a-price", "1", T0 + 4000)))
      query.processAllAvailable()
      // batch 2: all good
      input.addData(Seq(jsonTrade(5, "BTCUSDT", "99.0", "1", T0 + 5000)))
      query.processAllAvailable()
      query.recentProgress.foreach { p =>
        val m = p.observedMetrics.get("ingest")
        if (m != null && m.getAs[Long]("n_rows") > 0L)
          seen += ((m.getAs[Long]("n_rows"), m.getAs[Long]("n_malformed"),
            m.getAs[Long]("n_bad_decimal")))
      }
    } finally query.stop()
    assert(seen.contains((5L, 1L, 1L)),
      s"batch-1 metrics (5 rows, 1 malformed, 1 bad decimal) missing: $seen")
    assert(seen.contains((1L, 0L, 0L)), s"batch-2 metrics missing: $seen")
  }

  test("lshCandidatePairs surfaces the bucket-cap drop count via observe, no second job") {
    // 70 identical docs: every one of the 16 band buckets holds 70 > 64
    // (DedupOps.MaxBucket), so all 16 drop and the pair set is empty. The
    // drop count must ride the SAME action through observedMetrics — r10
    // shipped it as a standalone .count() job (the two-actions-for-
    // telemetry shape the repo criticizes in the reference's sink guard).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lsh_obs").toString
    val text = (0 until 12).map(i => s"token$i").mkString(" ")
    (0L until 70L).map(i => (i, text)).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    graft.ops.DedupOps.lastLshDrops.set(-1L)
    val pairs = graft.ops.DedupOps.minhashNeardup(spark, dir)
    // The observe rides the eager bucket checkpoint, so the register is
    // populated the moment the frame is CONSTRUCTED — before any caller
    // action. (A mid-plan observe read off pairs.queryExecution after an
    // AQE runtime replan reports empty — measured; hence the ride.)
    assert(graft.ops.DedupOps.lastLshDrops.get === 16L)
    assert(pairs.collect().isEmpty) // every bucket capped away
  }

  test("the streaming graph backfills over a batch DataFrame with identical results") {
    // the unified batch/stream claim (OhlcvStream Scaladoc): the SAME
    // parse -> watermark -> OHLCV composition, fed a plain batch DataFrame,
    // produces the hand-computed candle
    import spark.implicits._
    val lines = Seq(
      jsonTrade(1, "BTCUSDT", "100.5", "2", T0 + 10000),
      jsonTrade(2, "BTCUSDT", "103.0", "1", T0 + 20000),
      jsonTrade(3, "BTCUSDT", "99.0", "4", T0 + 50000)).toDF("json")
    val out = OhlcvStream.ohlcv(OhlcvStream.parseTrades(lines)).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[java.sql.Timestamp]("window_start").getTime === T0)
    assert(r.getAs[java.math.BigDecimal]("open_price").doubleValue() === 100.5)
    assert(r.getAs[java.math.BigDecimal]("high_price").doubleValue() === 103.0)
    assert(r.getAs[java.math.BigDecimal]("low_price").doubleValue() === 99.0)
    assert(r.getAs[java.math.BigDecimal]("close_price").doubleValue() === 99.0)
    assert(r.getAs[java.math.BigDecimal]("total_volume").doubleValue() === 7.0)
    assert(math.abs(r.getAs[java.math.BigDecimal]("vwap").doubleValue() - 100.0) < 1e-9)
  }
}
