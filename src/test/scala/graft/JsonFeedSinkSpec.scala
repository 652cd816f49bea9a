package graft

import java.io.{BufferedReader, InputStreamReader}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{JsonFeedSink, OhlcvStream}

/** Executes the producer-side JSON feed sink for real: a streaming OHLCV
  * query publishes update-mode aggregates as JSON lines over TCP (one
  * connection per partition per micro-batch), and a live local server
  * collects and re-parses them — the executable analog of the reference's
  * WebSocket→Kafka producer leg (producer/producer.py:22-25,60).
  */
class JsonFeedSinkSpec extends SparkSuite {

  private def jsonTrade(id: Long, sym: String, px: String, qty: String, t: Long) =
    s"""{"trade_id":$id,"symbol":"$sym","price":"$px","quantity":"$qty",""" +
      s""""trade_time":$t,"is_buyer_maker":false}"""

  test("OHLCV updates publish as JSON lines over per-partition TCP connections") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val received = new ConcurrentLinkedQueue[String]()
    val server = new ServerSocket(0)
    @volatile var accepting = true
    val acceptor = new Thread(() => {
      try while (accepting) {
        val sock = server.accept() // one connection per writing partition
        new Thread(() => {
          val in = new BufferedReader(
            new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
          try Iterator.continually(in.readLine()).takeWhile(_ != null)
            .foreach(received.add)
          finally sock.close()
        }).start()
      } catch { case _: java.net.SocketException => () } // closed at teardown
    }, "feed-acceptor")
    acceptor.setDaemon(true)
    acceptor.start()

    val t0 = 1700000040000L // minute-aligned
    val input = MemoryStream[String]
    val agg = OhlcvStream.ohlcv(
      OhlcvStream.parseTrades(input.toDF().select(col("value").as("json"))))
    val query = agg.writeStream
      .outputMode("update")
      .foreachBatch { (df: DataFrame, epoch: Long) =>
        JsonFeedSink.toSocket("127.0.0.1", server.getLocalPort)(df, epoch)
      }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("feed_ckpt").toString)
      .start()
    try {
      input.addData(Seq(
        jsonTrade(1, "BTCUSDT", "100.0", "2.0", t0 + 1000),
        jsonTrade(2, "BTCUSDT", "110.0", "1.0", t0 + 30000)))
      query.processAllAvailable()
      input.addData(Seq( // second batch refines BTC and introduces ETH
        jsonTrade(3, "BTCUSDT", "90.0", "1.0", t0 + 59000),
        jsonTrade(4, "ETHUSDT", "10.0", "5.0", t0 + 2000)))
      query.processAllAvailable()
      // the sink writes then the acceptor thread drains — poll briefly
      val deadline = System.currentTimeMillis() + 15000
      def parsed(): Map[String, (Double, Double)] = {
        val last = mutable.Map[String, (Double, Double)]()
        received.asScala.toList.foreach { line =>
          // lines are self-describing JSON; pick the fields the reference's
          // sink table keys on
          val sym = """"symbol":"([A-Z]+)"""".r.findFirstMatchIn(line).map(_.group(1))
          val vol = """"total_volume":([0-9.]+)""".r.findFirstMatchIn(line).map(_.group(1).toDouble)
          val close = """"close_price":([0-9.]+)""".r.findFirstMatchIn(line).map(_.group(1).toDouble)
          for (s <- sym; v <- vol; c <- close) last(s) = (v, c)
        }
        last.toMap
      }
      var got = parsed()
      while ((got.get("BTCUSDT") != Some((4.0, 90.0)) ||
              got.get("ETHUSDT") != Some((5.0, 10.0))) &&
             System.currentTimeMillis() < deadline) {
        Thread.sleep(200); got = parsed()
      }
      // last update per key: BTC refined to vol 4 / close 90; ETH vol 5
      assert(got.get("BTCUSDT").contains((4.0, 90.0)), s"$got / ${received.size} lines")
      assert(got.get("ETHUSDT").contains((5.0, 10.0)), s"$got / ${received.size} lines")
      // batch 1 published the partial BTC update too (update-mode contract)
      assert(received.asScala.exists(l =>
        l.contains(""""symbol":"BTCUSDT"""") && l.contains(""""total_volume":3""")),
        s"missing batch-1 partial update in ${received.size} lines")
    } finally {
      query.stop()
      accepting = false
      server.close()
    }
  }

  test("kafka writer is fully configured and its value projection round-trips") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val agg = OhlcvStream.ohlcv(OhlcvStream.parseTrades(
      input.toDF().select(col("value").as("json"))))
    // the connector jar is absent in this sandbox, so start() can't run —
    // but the writer must build (format/topic/checkpoint/trigger wiring)
    val w = JsonFeedSink.toKafkaWriter(agg, "broker:9092", "ohlcv_1min",
      java.nio.file.Files.createTempDirectory("kafka_ckpt").toString)
    assert(w != null)
    // and the value projection (to_json over the full row — the wire
    // format producer.py:24 serializes) is executable on the batch twin
    val t0 = 1700000040000L
    val batch = Seq(
      jsonTrade(1, "BTCUSDT", "100.0", "2.0", t0 + 1000),
      jsonTrade(2, "BTCUSDT", "110.0", "1.0", t0 + 30000)).toDF("json")
    val aggBatch = OhlcvStream.ohlcvWatermarked(OhlcvStream.parseTrades(batch))
    val line = aggBatch
      .select(to_json(struct(aggBatch.columns.map(aggBatch.col): _*)).as("value"))
      .as[String].collect().head
    assert(line.contains(""""symbol":"BTCUSDT"""") &&
      line.contains(""""total_volume":3""") &&
      line.contains(""""close_price":110"""), line)
  }
}
