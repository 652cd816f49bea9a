package graft

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.kafka.EmulatedBroker
import graft.streaming.{JsonFeedSink, OhlcvStream}

/** S3/S2 (SURVEY §2.1) EXECUTED: the unmodified production entry points
  * [[OhlcvStream.fromKafka]] and [[JsonFeedSink.toKafkaWriter]] run
  * end-to-end against [[graft.kafka.EmulatedKafkaProvider]] — a
  * test-classpath contract double registered under the connector's own
  * shortName `kafka` (the real `spark-sql-kafka-0-10` jar cannot be added
  * in this zero-egress sandbox). Covered contract surface, mirroring
  * processor.py:54-60 and producer.py:22-25:
  *
  *  - `startingOffsets=latest` skips pre-subscription history;
  *  - per-partition offsets checkpoint in the real source's JSON shape and
  *    a restarted query resumes exactly-once from them;
  *  - `failOnDataLoss` aborts on retention-truncated offsets (and clamps
  *    at-least-once when false);
  *  - `maxOffsetsPerTrigger` paces micro-batches;
  *  - producer semantics: keyed records stick to one partition, offsets
  *    are per-partition monotone, `to_json(struct(*))` values round-trip.
  */
class KafkaEmulatedSpec extends SparkSuite {

  private val T0 = 1705276800000L // 2024-01-15 00:00:00 UTC, minute-aligned

  private def jsonTrade(id: Long, sym: String, price: String, qty: String,
                        epochMs: Long): String =
    s"""{"trade_id":$id,"symbol":"$sym","price":"$price","quantity":"$qty","trade_time":$epochMs,"is_buyer_maker":false}"""

  test("fromKafka end-to-end: latest skips history, OHLCV aggregates the live feed") {
    val servers = "emu-e2e:9092"
    val topic = "raw_trades"
    EmulatedBroker.createTopic(servers, topic, 2)
    // pre-subscription history: startingOffsets=latest must never see it
    EmulatedBroker.sendString(servers, topic, "POISON",
      jsonTrade(999, "POISON", "1.0", "1", T0 + 1000))

    val agg = OhlcvStream.ohlcv(
      OhlcvStream.parseTrades(OhlcvStream.fromKafka(spark, servers, topic)))
    val q = agg.writeStream
      .outputMode("update")
      .format("memory")
      .queryName("kafka_e2e")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      q.processAllAvailable() // initial offset resolved at log end
      EmulatedBroker.sendString(servers, topic, "BTCUSDT",
        jsonTrade(1, "BTCUSDT", "100.0", "2", T0 + 1000))
      EmulatedBroker.sendString(servers, topic, "BTCUSDT",
        jsonTrade(2, "BTCUSDT", "110.0", "1", T0 + 2000))
      EmulatedBroker.sendString(servers, topic, "ETHUSDT",
        jsonTrade(3, "ETHUSDT", "50.0", "4", T0 + 3000))
      q.processAllAvailable()
      val rows = spark.table("kafka_e2e").collect()
        .map(r => r.getAs[String]("symbol") ->
          (r.getAs[java.math.BigDecimal]("open_price").doubleValue(),
            r.getAs[java.math.BigDecimal]("close_price").doubleValue(),
            r.getAs[java.math.BigDecimal]("total_volume").doubleValue()))
        .toMap
      assert(!rows.contains("POISON"), "latest must skip pre-subscription records")
      assert(rows("BTCUSDT") === ((100.0, 110.0, 3.0)))
      assert(rows("ETHUSDT") === ((50.0, 50.0, 4.0)))
    } finally q.stop()
  }

  test("checkpoint restart resumes from committed Kafka offsets, no loss, no dups") {
    val servers = "emu-resume:9092"
    val topic = "resume_topic"
    EmulatedBroker.createTopic(servers, topic, 1)
    val ckpt = java.nio.file.Files.createTempDirectory("kafka_ckpt").toString
    val seen = mutable.Buffer[String]()

    def mkQuery() = OhlcvStream.fromKafka(spark, servers, topic)
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        seen ++= df.collect().map(_.getAs[String]("json")); ()
      }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation", ckpt)
      .start()

    val q1 = mkQuery()
    try {
      q1.processAllAvailable()
      (1 to 3).foreach(i => EmulatedBroker.sendString(servers, topic, null, s"m$i"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(seen.toSeq === Seq("m1", "m2", "m3"))

    // offsets persisted in the real KafkaSourceOffset JSON shape
    val offsetsDir = new java.io.File(s"$ckpt/offsets")
    val lastBatch = offsetsDir.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toInt)
    val offsetJson = new String(
      java.nio.file.Files.readAllBytes(lastBatch.toPath))
    assert(offsetJson.contains("\"resume_topic\":{\"0\":3}"),
      s"expected per-partition offset JSON, got:\n$offsetJson")

    // records arriving while the query is down are picked up on restart
    (4 to 5).foreach(i => EmulatedBroker.sendString(servers, topic, null, s"m$i"))
    seen.clear()
    val q2 = mkQuery()
    try q2.processAllAvailable() finally q2.stop()
    assert(seen.toSeq === Seq("m4", "m5"),
      "restart must resume at the committed offset: no replay, no loss")
  }

  test("failOnDataLoss: truncated offsets abort the query, or clamp when false") {
    val servers = "emu-dataloss:9092"
    val topic = "dl_topic"
    EmulatedBroker.createTopic(servers, topic, 1)
    (0 until 5).foreach(i => EmulatedBroker.sendString(servers, topic, null, s"r$i"))
    EmulatedBroker.truncateTo(servers, topic, 0, 3) // retention deleted 0..2

    def query(failOnDataLoss: Boolean) = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", s"""{"$topic":{"0":0}}""") // below log start
      .option("failOnDataLoss", failOnDataLoss.toString)
      .load()
      .selectExpr("CAST(value AS STRING) AS v")

    val ex = intercept[StreamingQueryException] {
      val q = query(failOnDataLoss = true).writeStream
        .format("memory").queryName("dl_strict")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("dl1").toString)
        .start()
      try { q.processAllAvailable(); q.awaitTermination(5000) } finally q.stop()
    }
    assert(ex.getMessage.contains("failOnDataLoss") ||
      Option(ex.getCause).exists(_.getMessage.contains("failOnDataLoss")))

    val q2 = query(failOnDataLoss = false).writeStream
      .format("memory").queryName("dl_lenient")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("dl2").toString)
      .start()
    try {
      q2.processAllAvailable()
      val vs = spark.table("dl_lenient").collect().map(_.getString(0)).sorted
      assert(vs.toSeq === Seq("r3", "r4"), "lenient mode clamps to the log start")
    } finally q2.stop()
  }

  test("maxOffsetsPerTrigger paces micro-batches across partitions") {
    val servers = "emu-rate:9092"
    val topic = "rate_topic"
    EmulatedBroker.createTopic(servers, topic, 2)
    (0 until 10).foreach(i =>
      EmulatedBroker.sendString(servers, topic, s"k$i", s"v$i"))
    val batchSizes = mutable.Buffer[Long]()
    val q = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", "3")
      .load()
      .writeStream
      .foreachBatch((df: DataFrame, _: Long) => { batchSizes += df.count(); () })
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("rate").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val nonEmpty = batchSizes.filter(_ > 0)
    assert(nonEmpty.sum === 10L, s"all records delivered, got $batchSizes")
    assert(nonEmpty.forall(_ <= 3L), s"every batch within the cap, got $batchSizes")
    assert(nonEmpty.size >= 4, "the cap must split delivery into multiple batches")
  }

  test("partitions added mid-stream are discovered and read from earliest") {
    val servers = "emu-grow:9092"
    val topic = "grow_topic"
    EmulatedBroker.createTopic(servers, topic, 1)
    val seen = mutable.Buffer[(String, Int)]()
    val q = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", "latest")
      .load()
      .selectExpr("CAST(value AS STRING) AS v", "partition")
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        seen ++= df.collect().map(r => (r.getString(0), r.getInt(1))); ()
      }
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("grow").toString)
      .start()
    try {
      q.processAllAvailable() // initial offsets resolved: 1 partition, latest
      EmulatedBroker.send(servers, topic, null,
        "p0".getBytes(java.nio.charset.StandardCharsets.UTF_8), Some(0))
      q.processAllAvailable()
      // topic repartitioned under a LIVE query; records land on the new
      // partition, which the checkpoint has never seen
      EmulatedBroker.addPartitions(servers, topic, 1)
      EmulatedBroker.send(servers, topic, null,
        "p1".getBytes(java.nio.charset.StandardCharsets.UTF_8), Some(1))
      q.processAllAvailable()
      assert(seen.toSet === Set(("p0", 0), ("p1", 1)),
        s"new partition must be read from its earliest offset, got $seen")
    } finally q.stop()
  }

  test("batch read: keyed records stick to a partition; kafka schema surfaces") {
    val servers = "emu-batch:9092"
    val topic = "batch_topic"
    EmulatedBroker.createTopic(servers, topic, 3)
    for (k <- Seq("alpha", "beta"); i <- 0 until 3)
      EmulatedBroker.sendString(servers, topic, k, s"$k-$i")
    val prevV1List = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.sources.useV1SourceList",
      prevV1List.split(",").filterNot(_.trim == "kafka").mkString(","))
    try {
      val df = spark.read
        .format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("subscribe", topic)
        .load()
      assert(df.schema.fieldNames.toSeq === Seq("key", "value", "topic",
        "partition", "offset", "timestamp", "timestampType"))
      val rows = df.selectExpr("CAST(key AS STRING) AS k", "partition", "offset")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      assert(rows.length === 6)
      // one partition per key (hash partitioner), monotone offsets within it
      rows.groupBy(_._1).foreach { case (_, rs) =>
        assert(rs.map(_._2).distinct.length === 1, "keyed sends must stick")
      }
      rows.groupBy(r => (r._1, r._2)).foreach { case (_, rs) =>
        val offs = rs.map(_._3).sorted
        assert(offs.zip(offs.tail).forall { case (a, b) => b == a + 1 })
      }
    } finally spark.conf.set("spark.sql.sources.useV1SourceList", prevV1List)
  }

  test("toKafkaWriter: OHLCV updates round-trip the producer wire format") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val servers = "emu-sink:9092"
    val input = MemoryStream[String]
    val agg = OhlcvStream.ohlcv(
      OhlcvStream.parseTrades(input.toDF().select(col("value").as("json"))))
    val q = JsonFeedSink.toKafkaWriter(agg, servers, "ohlcv_out",
        java.nio.file.Files.createTempDirectory("sink_ckpt").toString,
        Trigger.ProcessingTime(0))
      .outputMode("update")
      .start()
    try {
      input.addData(Seq(
        jsonTrade(1, "BTCUSDT", "100.0", "2", T0 + 1000),
        jsonTrade(2, "BTCUSDT", "120.0", "2", T0 + 5000)))
      q.processAllAvailable()
    } finally q.stop()
    val values = EmulatedBroker.valuesOf(servers, "ohlcv_out")
    assert(values.nonEmpty, "sink must publish OHLCV updates")
    val parsed = spark.read.json(values.toDS())
    val last = parsed.orderBy(col("close_price").desc).head()
    assert(last.getAs[String]("symbol") === "BTCUSDT")
    assert(last.getAs[Double]("close_price") === 120.0)
    assert(last.getAs[Double]("total_volume") === 4.0)
    assert(parsed.columns.contains("vwap"), "full row serialized via to_json(struct(*))")
  }
}
