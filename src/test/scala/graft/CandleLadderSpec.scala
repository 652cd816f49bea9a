package graft

import java.sql.Timestamp
import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, Row}

import graft.streaming.CandleLadder

/** Chained 1-min → 5-min streaming rollup: append-mode emission under a
  * watermark with late data, and bit-exact parity with the batch
  * [[graft.ops.AggOps.ohlcv5minRollup]] when the same graph runs as a
  * batch backfill over the events table.
  */
class CandleLadderSpec extends SparkSuite {

  import spark.implicits._

  private val T0 = 1705276800000L // 2024-01-15 00:00:00 UTC

  private def tradesDf(raw: DataFrame): DataFrame =
    raw.toDF("epoch_ms", "symbol", "price", "quantity")
      .select(
        timestamp_millis(col("epoch_ms")).as("trade_time"),
        col("symbol"),
        col("price").cast("decimal(18,2)").as("price"),
        col("quantity").cast("decimal(18,0)").as("quantity"))

  /** Drive the ladder over MemoryStream batches, collecting append output. */
  private def runStream(
      batches: Seq[Seq[(Long, String, String, String)]]): Seq[Row] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, String)]
    val ladder = CandleLadder.rollup5min(tradesDf(input.toDF()))
    val out = mutable.ArrayBuffer[Row]()
    val query = ladder.writeStream
      .outputMode("append")
      .foreachBatch { (df: DataFrame, _: Long) => out ++= df.collect(); () }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ladder_ckpt").toString)
      .start()
    try {
      batches.foreach { b =>
        input.addData(b)
        query.processAllAvailable()
      }
    } finally query.stop()
    out.toSeq
  }

  test("append-mode 5-min candles: two granularities, late row merged, expired row dropped") {
    val rows = runStream(Seq(
      Seq( // minutes 0,1,4 of the first 5-min bucket + minute 6 of the second
        (T0 + 10000L, "BTC", "100.50", "2"),  // 00:00:10 open of bucket 0
        (T0 + 50000L, "BTC", "99.00", "4"),   // 00:00:50
        (T0 + 70000L, "BTC", "103.00", "1"),  // 00:01:10
        (T0 + 250000L, "BTC", "101.00", "3"), // 00:04:10
        (T0 + 370000L, "BTC", "98.00", "5")), // 00:06:10 (bucket 1)
      // late row for minute 4 — inside the 2-min watermark, must merge
      Seq((T0 + 280000L, "BTC", "104.00", "1")), // 00:04:40
      // advance watermark far past bucket 0's end → bucket 0 emits
      Seq((T0 + 900000L, "BTC", "50.00", "1")),  // 00:15:00
      // expired row for bucket 0 — watermark long past, must be DROPPED
      Seq((T0 + 260000L, "BTC", "1.00", "100")),
      // flush everything else
      Seq((T0 + 1800000L, "BTC", "60.00", "1"))))
    val byStart = rows.map(r => r.getAs[Timestamp]("window_start").getTime -> r).toMap
    val b0 = byStart(T0)
    // bucket 0 = minutes 0,1,4: open 100.50 (min 0), close 104.00 (late row
    // is the latest trade of minute 4), high 104, low 99
    assert(b0.getAs[Double]("open_price") == 100.50)
    assert(b0.getAs[Double]("high_price") == 104.00)
    assert(b0.getAs[Double]("low_price") == 99.00)
    assert(b0.getAs[Double]("close_price") == 104.00)
    assert(b0.getAs[Long]("total_volume") == 11L)
    assert(b0.getAs[Long]("n_minutes") == 3L)
    // vwap over ALL bucket-0 trades incl. the late one, excl. the expired one
    val tv = 10050L * 2 + 9900L * 4 + 10300L * 1 + 10100L * 3 + 10400L * 1
    assert(b0.getAs[Double]("vwap") == tv.toDouble / 11.0 / 100.0)
    assert(b0.getAs[Timestamp]("window_end").getTime == T0 + 300000L)
    // bucket 1 (00:05-00:10) emitted with its single minute
    val b1 = byStart(T0 + 300000L)
    assert(b1.getAs[Double]("open_price") == 98.00)
    assert(b1.getAs[Long]("n_minutes") == 1L)
    // the expired row changed nothing: bucket 0 was emitted once, not re-emitted
    assert(rows.count(_.getAs[Timestamp]("window_start").getTime == T0) == 1)
  }

  test("batch backfill through the same graph is bit-identical to ohlcv_5min_rollup") {
    val sf = "/root/testdata/sf0.001"
    val batchTrades = graft.model.Tables.events(spark, sf)
      .select(
        col("ts").as("trade_time"),
        col("event_type").as("symbol"),
        col("value").cast("decimal(18,2)").as("price"),
        get_json_object(col("props"), "$.k").cast("decimal(18,0)").as("quantity"))
    def key(r: Row) = (r.getAs[Timestamp]("window_start"), r.getAs[String]("symbol"))
    def vals(r: Row) = (
      r.getAs[Double]("open_price"), r.getAs[Double]("high_price"),
      r.getAs[Double]("low_price"), r.getAs[Double]("close_price"),
      r.getAs[Long]("total_volume"), r.getAs[Long]("n_minutes"),
      // isNullAt, not Option(getAs): a NULL double unboxes to 0.0 and
      // would mask a NULL-vs-0.0 vwap divergence between the two paths
      if (r.isNullAt(r.fieldIndex("vwap"))) None
      else Some(r.getAs[Double]("vwap")),
      r.getAs[Timestamp]("window_end"))
    val ladder = CandleLadder.rollup5min(batchTrades).collect()
      .map(r => key(r) -> vals(r)).toMap
    val batch = graft.ops.AggOps.ohlcv5minRollup(spark, sf).collect()
      .map(r => key(r) -> vals(r)).toMap
    assert(ladder.nonEmpty)
    assert(ladder === batch)
  }
}
