package graft

import java.sql.{DriverManager, Timestamp}
import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{JdbcUpsertSink, OhlcvStream}

/** W5 (SURVEY §2.4): checkpoint/recovery semantics. A restarted query with
  * the same checkpoint resumes from committed offsets (no reprocessing of
  * finished batches), and the idempotent upsert sink converges even when a
  * batch IS replayed after an uncommitted stop.
  */
class CheckpointRecoverySpec extends SparkSuite {

  private val T0 = 1705276800000L

  private def jsonTrade(id: Long, sym: String, price: String, qty: String,
                        epochMs: Long): String =
    s"""{"trade_id":$id,"symbol":"$sym","price":"$price","quantity":"$qty","trade_time":$epochMs,"is_buyer_maker":false}"""

  test("restart from checkpoint resumes at committed offset; sink state survives") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val url = "jdbc:derby:memory:graftRecovery;create=true"
    val conn = DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      """CREATE TABLE ohlcv_rec (
        |  "window_start" TIMESTAMP NOT NULL,
        |  "symbol" VARCHAR(16) NOT NULL,
        |  "total_volume" DOUBLE,
        |  PRIMARY KEY ("symbol", "window_start"))""".stripMargin)
    conn.close()
    val ckpt = java.nio.file.Files.createTempDirectory("rec_ckpt").toString
    val input = MemoryStream[String]
    val sink = JdbcUpsertSink.upsert(url, "ohlcv_rec", Seq("window_start", "symbol"))
    val seen = mutable.Buffer[Set[Long]]() // trade volumes per processed batch

    def mkQuery() = OhlcvStream.ohlcv(
      OhlcvStream.parseTrades(input.toDF().select(col("value").as("json"))))
      .select(col("window_start"), col("symbol"),
        col("total_volume").cast("double"))
      .writeStream
      .outputMode("update")
      .foreachBatch { (df: DataFrame, epochId: Long) =>
        seen += df.collect().map(_.getAs[Double]("total_volume").toLong).toSet
        sink(df, epochId)
      }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation", ckpt)
      .start()

    // phase 1: process one batch, stop cleanly
    val q1 = mkQuery()
    try {
      input.addData(Seq(jsonTrade(1, "BTCUSDT", "100.0", "2", T0 + 1000)))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(seen.exists(_.contains(2L)))

    // phase 2: more data arrives while down; restart with the same checkpoint
    input.addData(Seq(jsonTrade(2, "BTCUSDT", "100.0", "5", T0 + 2000)))
    seen.clear()
    val q2 = mkQuery()
    try {
      q2.processAllAvailable()
    } finally q2.stop()
    // resumed query must process ONLY the new data (batch 1 already
    // committed), refining the window to volume 7
    assert(seen.flatten.toSet.contains(7L), s"batches after restart: $seen")
    assert(!seen.flatten.toSet.contains(2L),
      s"batch 1 must not be reprocessed after clean stop: $seen")

    val rows = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "ohlcv_rec").load()
      .collect().map(r => (r.getAs[String]("symbol"),
        r.getAs[Timestamp]("window_start").getTime,
        r.getAs[Double]("total_volume"))).toSet
    assert(rows == Set(("BTCUSDT", T0, 7.0)), s"sink: $rows")
  }
}
