package graft

import java.sql.Timestamp
import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.DataFrame

import graft.streaming.{OhlcvStream, StreamTopK}

/** Chained stateful aggregations (Spark 3.4+ multi-stateful append mode):
  * per-(window, symbol) volume then per-window top-k, emitted once when the
  * watermark closes the window.
  */
class StreamTopKSpec extends SparkSuite {

  private def jsonTrade(id: Long, sym: String, price: String, qty: String,
                        epochMs: Long): String =
    s"""{"trade_id":$id,"symbol":"$sym","price":"$price","quantity":"$qty","trade_time":$epochMs,"is_buyer_maker":false}"""

  private val T0 = 1705276800000L // 2024-01-15 00:00:00 UTC

  test("per-window top-k by volume, deterministic tiebreak, append on close") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val agg = StreamTopK.topSymbols(
      OhlcvStream.parseTrades(input.toDF().select(col("value").as("json"))), k = 2)
    val out = mutable.ArrayBuffer[(Timestamp, Int, String, Double)]()
    val query = agg.writeStream
      .outputMode("append")
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.collect().foreach { r =>
          out += ((r.getAs[Timestamp]("window_start"), r.getAs[Int]("rank"),
            r.getAs[String]("symbol"),
            r.getAs[java.math.BigDecimal]("volume").doubleValue()))
        }
      }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("topk_ckpt").toString)
      .start()
    try {
      input.addData(Seq(
        // window [00:00, 00:01): BTC vol 5, ETH vol 7, DOGE vol 1
        jsonTrade(1, "BTCUSDT", "100", "2", T0 + 1000),
        jsonTrade(2, "BTCUSDT", "100", "3", T0 + 30000),
        jsonTrade(3, "ETHUSDT", "10", "7", T0 + 40000),
        jsonTrade(4, "DOGEUSDT", "1", "1", T0 + 50000),
        // window [00:01, 00:02): BTC 4 vs XRP 4 -> symbol tiebreak
        jsonTrade(5, "BTCUSDT", "100", "4", T0 + 70000),
        jsonTrade(6, "XRPUSDT", "2", "4", T0 + 80000)))
      query.processAllAvailable()
      input.addData(Seq(jsonTrade(99, "ZZZ", "1", "1", T0 + 600000))) // flush
      query.processAllAvailable()
    } finally query.stop()
    val w0 = out.filter(_._1.getTime == T0).sortBy(_._2)
    assert(w0.map(t => (t._2, t._3, t._4)) ==
      Seq((1, "ETHUSDT", 7.0), (2, "BTCUSDT", 5.0)))
    val w1 = out.filter(_._1.getTime == T0 + 60000).sortBy(_._2)
    assert(w1.map(t => (t._2, t._3, t._4)) ==
      Seq((1, "BTCUSDT", 4.0), (2, "XRPUSDT", 4.0)))
  }
}
