package graft

import java.sql.Timestamp
import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, Row}

import graft.streaming.StreamJoin

/** Stream-stream interval join: correctness of the time-bounded match set
  * and state eviction via both-side watermarks.
  */
class StreamJoinSpec extends SparkSuite {

  private val T0 = 1705276800000L

  test("trades join quotes within the 10s lookback only, spread computed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val trades = MemoryStream[(Long, String, Double, Timestamp)]
    val quotes = MemoryStream[(String, Double, Double, Timestamp)]
    val joined = StreamJoin.tradesWithQuotes(
      trades.toDF().toDF("trade_id", "symbol", "price", "trade_time"),
      quotes.toDF().toDF("q_symbol", "bid", "ask", "quote_time"))

    val out = mutable.Buffer[Row]()
    val q = joined.writeStream
      .outputMode("append")
      .foreachBatch { (df: DataFrame, _: Long) => out ++= df.collect(); () }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sj_ckpt").toString)
      .start()
    try {
      quotes.addData(Seq(
        ("BTCUSDT", 99.0, 101.0, new Timestamp(T0 + 1000)),   // in window of trade@5s
        ("BTCUSDT", 99.5, 100.5, new Timestamp(T0 + 4000)),   // in window
        ("BTCUSDT", 98.0, 102.0, new Timestamp(T0 - 20000)),  // too old
        ("ETHUSDT", 9.0, 11.0, new Timestamp(T0 + 2000))))    // wrong symbol
      trades.addData(Seq((1L, "BTCUSDT", 100.0, new Timestamp(T0 + 5000))))
      q.processAllAvailable()
      // advance both watermarks far past the join window so results emit
      quotes.addData(Seq(("ZZZ", 0.0, 0.0, new Timestamp(T0 + 600000))))
      trades.addData(Seq((99L, "ZZZ", 0.0, new Timestamp(T0 + 600000))))
      q.processAllAvailable()
    } finally q.stop()

    val matched = out.filter(_.getAs[Long]("trade_id") == 1L)
      .map(r => (r.getAs[Double]("bid"), r.getAs[Double]("ask"),
        r.getAs[Double]("spread"))).toSet
    assert(matched == Set((99.0, 101.0, 2.0), (99.5, 100.5, 1.0)),
      s"got $matched from ${out.size} rows")
  }

  test("left-outer interval join null-pads unmatched trades only after the watermark proves no match") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val trades = MemoryStream[(Long, String, Double, Timestamp)]
    val quotes = MemoryStream[(String, Double, Double, Timestamp)]
    val joined = StreamJoin.tradesWithQuotesLeftOuter(
      trades.toDF().toDF("trade_id", "symbol", "price", "trade_time"),
      quotes.toDF().toDF("q_symbol", "bid", "ask", "quote_time"))

    val out = mutable.Buffer[Row]()
    val q = joined.writeStream
      .outputMode("append")
      .foreachBatch { (df: DataFrame, _: Long) => out ++= df.collect(); () }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sjlo_ckpt").toString)
      .start()
    try {
      quotes.addData(Seq(
        ("BTCUSDT", 99.0, 101.0, new Timestamp(T0 + 1000)))) // matches trade 1
      trades.addData(Seq(
        (1L, "BTCUSDT", 100.0, new Timestamp(T0 + 5000)),    // has a quote
        (2L, "ETHUSDT", 10.0, new Timestamp(T0 + 5000))))    // never gets one
      q.processAllAvailable()
      // before the watermark clears trade 2's window, it must NOT emit:
      // "no match yet" is not "no match"
      assert(!out.exists(_.getAs[Long]("trade_id") == 2L),
        s"outer row emitted before watermark proof: $out")
      // advance both watermarks past trade 2's window + lateness
      quotes.addData(Seq(("ZZZ", 0.0, 0.0, new Timestamp(T0 + 600000))))
      trades.addData(Seq((99L, "ZZZ", 0.0, new Timestamp(T0 + 600000))))
      q.processAllAvailable()
      trades.addData(Seq((98L, "ZZZ", 0.0, new Timestamp(T0 + 1200000))))
      quotes.addData(Seq(("ZZZ", 0.0, 0.0, new Timestamp(T0 + 1200000))))
      q.processAllAvailable()
    } finally q.stop()

    val t1 = out.filter(_.getAs[Long]("trade_id") == 1L)
      .map(r => (r.getAs[Double]("bid"), r.getAs[Double]("ask"))).toSet
    assert(t1 == Set((99.0, 101.0)), s"matched side wrong: $out")
    val t2 = out.filter(_.getAs[Long]("trade_id") == 2L)
    assert(t2.size == 1 && t2.head.isNullAt(t2.head.fieldIndex("bid")),
      s"expected exactly one null-padded row for trade 2, got: $out")
  }

  test("stream-static enrichment broadcasts the dim and keeps unmatched trades") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val trades = MemoryStream[(Long, String, Double, Timestamp)]
    val dim = Seq(("BTCUSDT", "Bitcoin", 8), ("ETHUSDT", "Ethereum", 18))
      .toDF("symbol", "asset_name", "decimals")
    val enriched = StreamJoin.enrichWithDim(
      trades.toDF().toDF("trade_id", "symbol", "price", "trade_time"), dim)
    val out = mutable.Buffer[Row]()
    val q = enriched.writeStream
      .outputMode("append")
      .foreachBatch { (df: DataFrame, _: Long) => out ++= df.collect(); () }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("enrich_ckpt").toString)
      .start()
    try {
      trades.addData(Seq(
        (1L, "BTCUSDT", 100.0, new Timestamp(T0)),
        (2L, "UNKNOWN", 5.0, new Timestamp(T0))))
      q.processAllAvailable()
    } finally q.stop()
    val byId = out.map(r => r.getAs[Long]("trade_id") ->
      Option(r.getAs[String]("asset_name"))).toMap
    assert(byId == Map(1L -> Some("Bitcoin"), 2L -> None))
  }

  test("join state is bounded: plan carries watermarks on both sides") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val trades = MemoryStream[(Long, String, Double, Timestamp)]
    val quotes = MemoryStream[(String, Double, Double, Timestamp)]
    val joined = StreamJoin.tradesWithQuotes(
      trades.toDF().toDF("trade_id", "symbol", "price", "trade_time"),
      quotes.toDF().toDF("q_symbol", "bid", "ask", "quote_time"))
    val plan = joined.queryExecution.analyzed.toString
    assert(plan.contains("EventTimeWatermark"), plan)
    assert("EventTimeWatermark".r.findAllIn(plan).size == 2,
      "both join inputs must be watermarked for state eviction")
  }
}
