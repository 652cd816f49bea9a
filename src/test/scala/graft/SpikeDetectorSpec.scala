package graft

import java.sql.Timestamp
import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, Row}

import graft.streaming.{RunningStats, SpikeDetector}

/** transformWithState spike detector: alert set, per-symbol isolation, and
  * cross-query state continuity through the checkpoint.
  *
  * Runs use Trigger.AvailableNow against a SHARED checkpoint dir:
  * processing-time mode triggers micro-batches continuously for potential
  * timers, so `processAllAvailable` never settles on a live query — and
  * resuming the second drain from the first's checkpoint doubles as a
  * transformWithState state-recovery test.
  */
class SpikeDetectorSpec extends SparkSuite {

  private val T0 = 1705276800000L

  private def trade(sym: String, px: Double, t: Long) =
    RunningStats.TradeRow(sym, px, new Timestamp(t))

  test("alerts fire only on >5% moves, per symbol, with state recovered across runs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RunningStats.TradeRow]
    val alerts = SpikeDetector.detect(input.toDS())
    val ck = java.nio.file.Files.createTempDirectory("spike_ckpt").toString
    val out = mutable.Buffer[Row]()

    def drain(): Unit = {
      val q = alerts.toDF().writeStream
        .outputMode("update")
        .foreachBatch { (df: DataFrame, _: Long) => out ++= df.collect(); () }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ck)
        .start()
      q.awaitTermination()
    }

    input.addData(Seq(
      trade("BTC", 100.0, T0),          // first trade: no previous, no alert
      trade("BTC", 104.0, T0 + 1000),   // +4%: below threshold
      trade("ETH", 10.0, T0 + 1000)))   // other symbol: independent chain
    drain()
    input.addData(Seq(
      trade("BTC", 110.0, T0 + 2000),   // +5.77% vs 104 (state from run 1)
      trade("ETH", 10.2, T0 + 2000)))   // +2%: quiet
    drain()
    input.addData(Seq(
      trade("BTC", 100.0, T0 + 1500)))  // LATE: would be a phantom -9% vs 110
    drain()

    val got = out.map(r => (r.getAs[String]("symbol"),
      r.getAs[Double]("prev_price"), r.getAs[Double]("price"))).toSet
    assert(got == Set(("BTC", 104.0, 110.0)), s"got $got")
    val move = out.head.getAs[Double]("move_pct")
    assert(math.abs(move - (110.0 - 104.0) / 104.0 * 100) < 1e-9)
  }
}
