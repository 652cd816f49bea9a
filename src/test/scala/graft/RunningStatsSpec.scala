package graft

import java.sql.Timestamp
import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.RunningStats
import graft.streaming.RunningStats.{SymbolStats, TradeRow}

/** flatMapGroupsWithState specs: cumulative per-key state across
  * micro-batches, and event-time-timeout state eviction.
  */
class RunningStatsSpec extends SparkSuite {

  private val T0 = 1705276800000L // 2024-01-15 00:00:00 UTC

  private def run(batches: Seq[Seq[TradeRow]], stateTtl: String)
      : Seq[Map[String, SymbolStats]] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TradeRow]
    val stats = RunningStats.runningStats(input.toDS(), stateTtl = stateTtl)
    val perBatch = mutable.Buffer[Map[String, SymbolStats]]()
    val query = stats.writeStream
      .outputMode("update")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[SymbolStats], _: Long) =>
        perBatch += ds.collect().map(s => s.symbol -> s).toMap
        ()
      }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("rstats_ckpt").toString)
      .start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
    } finally query.stop()
    perBatch.toSeq
  }

  private def trade(sym: String, price: Double, offsetMs: Long) =
    TradeRow(sym, price, new Timestamp(T0 + offsetMs))

  test("state accumulates across micro-batches per key") {
    val out = run(Seq(
      Seq(trade("BTC", 100.0, 0), trade("BTC", 105.0, 1000), trade("ETH", 10.0, 500)),
      Seq(trade("BTC", 95.0, 2000))), stateTtl = "1 hour")
    val afterFirst = out.find(_.contains("BTC")).get
    assert(afterFirst("BTC").n_trades == 2)
    assert(afterFirst("BTC").high == 105.0 && afterFirst("BTC").low == 100.0)
    // latest emission per key across all micro-batches (streams append an
    // empty watermark-advance batch at the end)
    val finalState = out.foldLeft(Map.empty[String, SymbolStats])(_ ++ _)
    assert(finalState("BTC").n_trades == 3)
    assert(finalState("BTC").low == 95.0 && finalState("BTC").last == 95.0)
    assert(out.filter(_.nonEmpty).last.get("ETH").isEmpty ||
      finalState("ETH").n_trades == 1, "ETH must not re-emit without new data")
  }

  test("idle keys time out and state resets (bounded state at scale)") {
    val out = run(Seq(
      Seq(trade("BTC", 100.0, 0)),
      // one hour later: only ETH trades; watermark advances far past
      // BTC.last + 1 min TTL -> BTC state evicted
      Seq(trade("ETH", 10.0, 3600000), trade("ETH", 11.0, 3601000)),
      // BTC returns: state restarted from zero, not 2 trades
      Seq(trade("BTC", 50.0, 3700000))), stateTtl = "1 minute")
    val finalState = out.foldLeft(Map.empty[String, SymbolStats])(_ ++ _)
    assert(finalState("BTC").n_trades == 1,
      s"expected fresh state, got ${finalState("BTC")}")
    assert(finalState("BTC").high == 50.0 && finalState("BTC").low == 50.0)
  }
}
