package graft

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}

import graft.streaming.{DeadLetter, OhlcvStream}

/** Dead-letter routing: the clean/quarantine split is a partition of the
  * input, rule labels are correct per row, and the quarantine carries the
  * SAME rows the batch dq_quarantine rules would flag.
  */
class DeadLetterSpec extends SparkSuite {

  private val T0 = 1705276800000L

  private def j(id: String, price: String, qty: String, t: String): String =
    s"""{"trade_id":$id,"symbol":"BTC","price":$price,"quantity":$qty,"trade_time":$t,"is_buyer_maker":false}"""

  test("clean/quarantine partition the stream with correct rule labels") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val clean = mutable.Buffer[Row]()
    val quarantined = mutable.Buffer[Row]()
    val q = DeadLetter.route(
      OhlcvStream.parseTrades(input.toDF().select(col("value").as("json"))),
      java.nio.file.Files.createTempDirectory("dlq_ckpt").toString,
      (df: DataFrame, _: Long) => { clean ++= df.collect(); () },
      (df: DataFrame, _: Long) => { quarantined ++= df.collect(); () })
    try {
      input.addData(Seq(
        j("1", "\"100.5\"", "\"2\"", s"$T0"),        // clean
        j("2", "\"-5\"", "\"1\"", s"$T0"),           // price_valid
        j("3", "\"abc\"", "\"0\"", s"$T0"),          // price_valid (bad cast) + quantity_valid
        j("null", "\"100\"", "\"1\"", s"$T0"),       // trade_id_present
        j("5", "\"100\"", "\"1\"", "null"),          // trade_time_present
        """not json at all"""))                      // everything null
      q.processAllAvailable()
    } finally q.stop()
    assert(clean.map(_.getAs[Long]("trade_id")) === Seq(1L))
    val rulesById = quarantined
      .map(r => Option(r.getAs[java.lang.Long]("trade_id")).map(_.toLong) ->
        r.getAs[scala.collection.Seq[String]]("rules").toSet).toMap
    assert(rulesById(Some(2L)) === Set("price_valid"))
    assert(rulesById(Some(3L)) === Set("price_valid", "quantity_valid"))
    assert(rulesById(Some(5L)) === Set("trade_time_present"))
    // trade_id NULL rows (explicit null + unparseable line) both fire
    // trade_id_present at minimum
    val anon = quarantined.filter(r => r.isNullAt(r.fieldIndex("trade_id")))
    assert(anon.size === 2)
    anon.foreach(r =>
      assert(r.getAs[scala.collection.Seq[String]]("rules").contains("trade_id_present")))
    // partition property: every input row lands in exactly one side
    assert(clean.size + quarantined.size === 6)
  }
}
