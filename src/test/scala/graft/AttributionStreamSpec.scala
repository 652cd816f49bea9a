package graft

import java.sql.Timestamp
import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, Row}

import graft.streaming.Attribution
import graft.streaming.Attribution.EventRow

/** The streaming last-touch processor pinned two ways: (1) an in-order
  * multi-batch replay of the real sf0.001 events table aggregates to
  * EXACTLY the batch attribution_last_touch output — same counts, same
  * IEEE mean-gap bits; (2) a late click is skipped, never retro-credited.
  */
class AttributionStreamSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def runStream(batches: Seq[Seq[EventRow]]): Seq[Row] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val out = mutable.Buffer[Row]()
    val q = Attribution.lastTouch(input.toDS()).toDF().writeStream
      .outputMode("update")
      .foreachBatch { (df: DataFrame, _: Long) => out ++= df.collect(); () }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("attr_ckpt").toString)
      .start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    out.toSeq
  }

  test("in-order replay of real events equals the batch attribution op exactly") {
    val events = graft.model.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => EventRow(r.getAs[Long]("user_id"), r.getAs[Timestamp]("ts"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
      .sortBy(e => (Attribution.usOf(e.ts), e.event_id))
    // three chronological batches: global time order implies per-user order
    val third = (events.length + 2) / 3
    val rows = runStream(events.grouped(third).map(_.toSeq).toSeq)

    val utc = java.time.ZoneOffset.UTC
    val got = rows.map { r =>
      val us = r.getAs[Long]("purchase_us")
      val day = java.time.Instant.ofEpochSecond(us / 1000000L)
        .atZone(utc).toLocalDate.toString
      val gap =
        if (r.isNullAt(r.fieldIndex("click_us"))) None
        else Some(us - r.getAs[Long]("click_us"))
      (day, gap)
    }.groupBy(_._1).map { case (day, ps) =>
      val gaps = ps.flatMap(_._2)
      val avg = if (gaps.isEmpty) None
                else Some(gaps.sum.toDouble / gaps.size.toDouble)
      day -> (ps.size.toLong, gaps.size.toLong, avg)
    }

    val batch = SparkEntry.queries("attribution_last_touch")(spark, sf).collect()
      .map { r =>
        val avg = if (r.isNullAt(r.fieldIndex("avg_gap_us"))) None
                  else Some(r.getAs[Double]("avg_gap_us"))
        r.getAs[String]("day") ->
          (r.getAs[Long]("n_purchases"), r.getAs[Long]("n_attributed"), avg)
      }.toMap
    assert(got == batch)
    assert(got.values.map(_._1).sum > 0, "no purchases replayed - vacuous")
  }

  test("a late click is skipped, never retro-credited") {
    val t0 = 1705276800000L
    def ev(id: Long, offMs: Long, typ: String) =
      EventRow(1L, new Timestamp(t0 + offMs), id, typ)
    val rows = runStream(Seq(
      Seq(ev(1, 0, "click"), ev(2, 20000, "purchase")),
      // arrives after the purchase was applied, though timestamped between
      Seq(ev(3, 10000, "click")),
      Seq(ev(4, 30000, "purchase"))))
    val byPurchase = rows.map(r => r.getAs[Long]("purchase_id") ->
      (if (r.isNullAt(r.fieldIndex("click_us"))) None
       else Some(r.getAs[Long]("click_us")))).toMap
    val usAt = (off: Long) => (t0 + off) * 1000L
    assert(byPurchase(2L) == Some(usAt(0)))
    // the late click (id 3) was skipped: purchase 4 still credits click 1
    assert(byPurchase(4L) == Some(usAt(0)))
  }
}
