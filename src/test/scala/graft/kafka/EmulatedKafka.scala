package graft.kafka

import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.json4s.{DefaultFormats, JField, JObject, JLong}
import org.json4s.jackson.JsonMethods.{compact, parse, render}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** TEST-CLASSPATH contract double for `spark-sql-kafka-0-10`.
  *
  * The reference's durable entry/exit is Kafka (processor.py:54-60 source,
  * producer.py:22-25 producer), and the engine's production code
  * ([[graft.streaming.OhlcvStream.fromKafka]],
  * [[graft.streaming.JsonFeedSink.toKafkaWriter]]) targets the real
  * connector verbatim. The connector jar cannot be added in this sandbox
  * (zero-egress; `/opt/spark/jars` does not ship it), so this provider
  * registers the SAME shortName `"kafka"` via a `DataSourceRegister`
  * service file under `src/test/resources` — TEST scope only, so a real
  * deployment still resolves the genuine connector — and emulates the
  * connector's observable contract so the unmodified production code paths
  * EXECUTE end-to-end in ScalaTest:
  *
  *   - fixed 7-column Kafka schema (key/value binary, topic, partition,
  *     offset, timestamp, timestampType);
  *   - `subscribe` (comma list), `startingOffsets` earliest / latest /
  *     per-partition JSON (with -1 = latest, -2 = earliest sentinels);
  *   - per-topic-partition offsets checkpointed in the real source's JSON
  *     shape `{"topic":{"0":offset}}` and resumed across query restarts;
  *   - `failOnDataLoss` (default true): a start offset below the log-start
  *     (retention truncation) aborts the query, or clamps with
  *     at-least-once semantics when false;
  *   - `maxOffsetsPerTrigger` admission control, distributed across
  *     partitions proportionally to lag (the connector's `rateLimit`);
  *   - producer semantics: hash-partition by key, round-robin when
  *     keyless, append pre-commit (at-least-once under retries), `topic`
  *     column overriding the `topic` option.
  *
  * Divergences (documented, irrelevant to the pipeline under test): key
  * hashing is JVM `Arrays.hashCode` not murmur2; the broker is an
  * in-process log (local[n] single-JVM — executor threads reach it like
  * executors reach a broker over TCP); no SSL/SASL options.
  */
final class EmulatedKafkaProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kafka"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EmulatedKafka.KafkaSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new EmulatedKafkaTable(new CaseInsensitiveStringMap(properties))
}

object EmulatedKafka {
  /** The real connector's fixed read schema, field-for-field. */
  val KafkaSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Offsets in the real `KafkaSourceOffset` JSON shape, deterministically
    * sorted so checkpoint files are byte-stable: `{"topic":{"0":5,"1":7}}`.
    */
  def offsetsToJson(m: Map[(String, Int), Long]): String = {
    val byTopic = m.groupBy(_._1._1).toSeq.sortBy(_._1).map { case (t, tps) =>
      JField(t, JObject(tps.toSeq.sortBy(_._1._2).map {
        case ((_, p), o) => JField(p.toString, JLong(o))
      }.toList))
    }
    compact(render(JObject(byTopic.toList)))
  }

  def jsonToOffsets(s: String): Map[(String, Int), Long] = {
    implicit val fmt: DefaultFormats = DefaultFormats
    parse(s).extract[Map[String, Map[String, Long]]]
      .flatMap { case (t, ps) => ps.map { case (p, o) => ((t, p.toInt), o) } }
  }
}

/** In-process multi-cluster broker. Each distinct `bootstrap.servers`
  * string is an isolated cluster (specs use unique server strings instead
  * of a global reset). Offsets are absolute: record i of a partition log
  * holds offset `logStart + i`; [[truncateTo]] emulates retention deleting
  * a prefix, which is what makes `failOnDataLoss` testable.
  */
object EmulatedBroker {
  final case class Rec(key: Array[Byte], value: Array[Byte], tsMillis: Long)
  final class PartitionLog {
    val recs = new mutable.ArrayBuffer[Rec]()
    var logStart = 0L
    def end: Long = logStart + recs.size
  }

  private val clusters =
    mutable.Map[String, mutable.Map[String, Array[PartitionLog]]]()
  private val roundRobin = new AtomicLong(0L)

  def createTopic(servers: String, topic: String, partitions: Int): Unit =
    synchronized {
      clusters.getOrElseUpdate(servers, mutable.Map())
        .getOrElseUpdate(topic, Array.fill(partitions)(new PartitionLog))
    }

  /** auto.create.topics.enable=true analog: unknown topics appear with one
    * partition on first producer or consumer contact.
    */
  private def topicLogs(servers: String, topic: String): Array[PartitionLog] =
    clusters.getOrElseUpdate(servers, mutable.Map())
      .getOrElseUpdate(topic, Array.fill(1)(new PartitionLog))

  def partitionsOf(servers: String, topic: String): Int =
    synchronized { topicLogs(servers, topic).length }

  /** Producer append: keyed records hash-partition (sticky per key),
    * keyless round-robin; returns (partition, offset) like a RecordMetadata.
    */
  def send(servers: String, topic: String, key: Array[Byte],
           value: Array[Byte], partition: Option[Int] = None): (Int, Long) =
    synchronized {
      val logs = topicLogs(servers, topic)
      val p = partition.getOrElse {
        if (key == null) (roundRobin.getAndIncrement() % logs.length).toInt
        else (java.util.Arrays.hashCode(key) & 0x7fffffff) % logs.length
      }
      require(p >= 0 && p < logs.length,
        s"Partition $p out of range for topic $topic (${logs.length} partitions)")
      val off = logs(p).end
      logs(p).recs += Rec(key, value, System.currentTimeMillis())
      (p, off)
    }

  def sendString(servers: String, topic: String, key: String, value: String): (Int, Long) =
    send(servers, topic,
      if (key == null) null else key.getBytes(StandardCharsets.UTF_8),
      value.getBytes(StandardCharsets.UTF_8))

  def beginningOffset(servers: String, topic: String, p: Int): Long =
    synchronized { topicLogs(servers, topic)(p).logStart }
  def endOffset(servers: String, topic: String, p: Int): Long =
    synchronized { topicLogs(servers, topic)(p).end }

  /** Fetch [from, until) with absolute offsets attached. */
  def fetch(servers: String, topic: String, p: Int,
            from: Long, until: Long): Array[(Long, Rec)] =
    synchronized {
      val log = topicLogs(servers, topic)(p)
      val lo = math.max(from, log.logStart)
      (lo until math.min(until, log.end)).map { off =>
        (off, log.recs((off - log.logStart).toInt))
      }.toArray
    }

  /** Partition-expansion emulation (`kafka-topics --alter --partitions`):
    * the consumer contract is that partitions discovered mid-stream are
    * read from their EARLIEST offset, not the startingOffsets spec.
    */
  def addPartitions(servers: String, topic: String, count: Int): Unit =
    synchronized {
      val logs = topicLogs(servers, topic)
      require(count > 0)
      clusters(servers)(topic) = logs ++ Array.fill(count)(new PartitionLog)
    }

  /** Retention emulation: delete every record below `newStart`. */
  def truncateTo(servers: String, topic: String, p: Int, newStart: Long): Unit =
    synchronized {
      val log = topicLogs(servers, topic)(p)
      val drop = math.max(0L, math.min(newStart, log.end) - log.logStart).toInt
      log.recs.remove(0, drop)
      log.logStart += drop
    }

  def valuesOf(servers: String, topic: String): Seq[String] = synchronized {
    topicLogs(servers, topic).toSeq.flatMap(_.recs.map(r =>
      new String(r.value, StandardCharsets.UTF_8)))
  }
}

private final class EmulatedKafkaTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {
  private val servers = options.get("kafka.bootstrap.servers")
  require(servers != null,
    "Option 'kafka.bootstrap.servers' must be specified for configuring Kafka consumer")

  override def name(): String = s"EmulatedKafka($servers)"
  override def schema(): StructType = EmulatedKafka.KafkaSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ,
      TableCapability.STREAMING_WRITE, TableCapability.BATCH_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA).asJava

  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder = {
    val subscribe = options.get("subscribe")
    require(subscribe != null,
      "One of the following options must be specified for Kafka source: subscribe")
    val topics = subscribe.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    topics.foreach(t => EmulatedBroker.createTopic(servers, t,
      math.max(1, EmulatedBroker.partitionsOf(servers, t))))
    val failOnDataLoss = options.getBoolean("failOnDataLoss", true)
    val maxOffsets = Option(options.get("maxOffsetsPerTrigger")).map(_.toLong)
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = EmulatedKafka.KafkaSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new EmulatedKafkaMicroBatchStream(servers, topics,
            Option(options.get("startingOffsets")).getOrElse("latest"),
            failOnDataLoss, maxOffsets)
        override def toBatch: Batch = new EmulatedKafkaBatch(servers, topics,
          Option(options.get("startingOffsets")).getOrElse("earliest"),
          Option(options.get("endingOffsets")).getOrElse("latest"), failOnDataLoss)
      }
    }
  }

  // SupportsStreamingUpdateAsAppend: update-mode output re-sends changed
  // rows as plain appends — exactly the real Kafka sink's declaration (the
  // downstream upsert key makes re-emission idempotent)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with org.apache.spark.sql.internal.connector.SupportsStreamingUpdateAsAppend {
      override def build(): Write = new Write {
        private val writeInfo = EmuWriteInfo(servers,
          Option(options.get("topic")), info.schema())
        override def toStreaming: StreamingWrite = new StreamingWrite {
          override def createStreamingWriterFactory(p: PhysicalWriteInfo): StreamingDataWriterFactory =
            new EmuWriterFactory(writeInfo)
          override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
          override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
        }
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(p: PhysicalWriteInfo): DataWriterFactory =
            new EmuWriterFactory(writeInfo)
          override def commit(messages: Array[WriterCommitMessage]): Unit = ()
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
}

private final case class EmuKafkaOffset(offsets: Map[(String, Int), Long])
    extends Offset {
  override def json(): String = EmulatedKafka.offsetsToJson(offsets)
}

private object EmuKafkaOffsets {
  def allPartitions(servers: String, topics: Seq[String]): Seq[(String, Int)] =
    topics.flatMap(t =>
      (0 until EmulatedBroker.partitionsOf(servers, t)).map(p => (t, p)))

  def earliest(servers: String, topics: Seq[String]): Map[(String, Int), Long] =
    allPartitions(servers, topics)
      .map { case (t, p) => ((t, p), EmulatedBroker.beginningOffset(servers, t, p)) }
      .toMap
  def latest(servers: String, topics: Seq[String]): Map[(String, Int), Long] =
    allPartitions(servers, topics)
      .map { case (t, p) => ((t, p), EmulatedBroker.endOffset(servers, t, p)) }
      .toMap

  /** earliest | latest | JSON with -1/-2 sentinels; partitions absent from
    * the JSON default to latest, like the real source.
    */
  def resolve(servers: String, topics: Seq[String], spec: String): Map[(String, Int), Long] =
    spec.trim match {
      case "earliest" => earliest(servers, topics)
      case "latest"   => latest(servers, topics)
      case json =>
        val given = EmulatedKafka.jsonToOffsets(json)
        allPartitions(servers, topics).map { case tp @ (t, p) =>
          tp -> (given.get(tp) match {
            case Some(-1L) | None => EmulatedBroker.endOffset(servers, t, p)
            case Some(-2L)        => EmulatedBroker.beginningOffset(servers, t, p)
            case Some(o)          => o
          })
        }.toMap
    }

  /** Per-tp ranges with the real source's data-loss behavior at the start
    * bound: below-log-start reads abort (failOnDataLoss=true) or clamp.
    */
  def ranges(servers: String, start: Map[(String, Int), Long],
             end: Map[(String, Int), Long],
             failOnDataLoss: Boolean): Seq[(String, Int, Long, Long)] =
    end.toSeq.sortBy { case ((t, p), _) => (t, p) }.map { case ((t, p), until) =>
      // a partition created after the checkpoint starts from its beginning
      val s = start.getOrElse((t, p), EmulatedBroker.beginningOffset(servers, t, p))
      val logStart = EmulatedBroker.beginningOffset(servers, t, p)
      val from = if (s < logStart) {
        if (failOnDataLoss) throw new IllegalStateException(
          s"Offsets out of range for $t-$p: requested $s but log starts at " +
            s"$logStart. Some data may have been lost because they are not " +
            "available in Kafka any more. Set the source option " +
            "\"failOnDataLoss\" to \"false\" to ignore.")
        else logStart
      } else s
      (t, p, from, until)
    }
}

private final class EmulatedKafkaMicroBatchStream(
    servers: String, topics: Seq[String], startingOffsets: String,
    failOnDataLoss: Boolean, maxOffsetsPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset =
    EmuKafkaOffset(EmuKafkaOffsets.resolve(servers, topics, startingOffsets))

  override def deserializeOffset(json: String): Offset =
    EmuKafkaOffset(EmulatedKafka.jsonToOffsets(json))

  override def getDefaultReadLimit: ReadLimit =
    maxOffsetsPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  // the real source throws here too once admission control is in play
  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startMap = start.asInstanceOf[EmuKafkaOffset].offsets
    val end = EmuKafkaOffsets.latest(servers, topics)
    limit match {
      case rows: ReadMaxRows =>
        // proportional-to-lag distribution, the connector's rateLimit shape
        val lags = end.map { case (tp, e) =>
          tp -> math.max(0L, e - startMap.getOrElse(tp, 0L))
        }
        val total = lags.values.sum
        val max = rows.maxRows()
        if (total <= max) EmuKafkaOffset(end)
        else {
          var granted = end.map { case (tp, _) =>
            val startO = startMap.getOrElse(tp, 0L)
            tp -> (startO + max * lags(tp) / total)
          }
          // rounding can strand the batch at zero net advance; nudge one tp
          if (granted == startMap && total > 0) {
            val (tp, _) = lags.find(_._2 > 0).get
            granted = granted.updated(tp, startMap.getOrElse(tp, 0L) + 1)
          }
          EmuKafkaOffset(granted)
        }
      case _ => EmuKafkaOffset(end)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    EmuKafkaOffsets.ranges(servers,
      start.asInstanceOf[EmuKafkaOffset].offsets,
      end.asInstanceOf[EmuKafkaOffset].offsets, failOnDataLoss)
      .collect { case (t, p, from, until) if until > from =>
        EmuKafkaRange(servers, t, p, from, until): InputPartition
      }.toArray

  override def createReaderFactory(): PartitionReaderFactory = EmuKafkaReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private final class EmulatedKafkaBatch(
    servers: String, topics: Seq[String],
    startingOffsets: String, endingOffsets: String, failOnDataLoss: Boolean)
    extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    EmuKafkaOffsets.ranges(servers,
      EmuKafkaOffsets.resolve(servers, topics, startingOffsets),
      EmuKafkaOffsets.resolve(servers, topics, endingOffsets), failOnDataLoss)
      .collect { case (t, p, from, until) if until > from =>
        EmuKafkaRange(servers, t, p, from, until): InputPartition
      }.toArray
  override def createReaderFactory(): PartitionReaderFactory = EmuKafkaReaderFactory
}

/** One topic-partition offset range = one Spark task, like the real scan. */
private final case class EmuKafkaRange(servers: String, topic: String,
                                       partition: Int, from: Long, until: Long)
    extends InputPartition

private object EmuKafkaReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[EmuKafkaRange]
    val rows = EmulatedBroker.fetch(r.servers, r.topic, r.partition, r.from, r.until)
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val (off, rec) = rows(i)
        new GenericInternalRow(Array[Any](
          rec.key, rec.value, UTF8String.fromString(r.topic), r.partition,
          off, rec.tsMillis * 1000L, 0)) // micros; timestampType 0 = CreateTime
      }
      override def close(): Unit = ()
    }
  }
}

/** Producer-side projection contract, resolved once on the driver: `value`
  * required (string or binary), optional `key`, optional `topic` column
  * overriding the topic option, optional `partition` int.
  */
private final case class EmuWriteInfo(servers: String, topicOpt: Option[String],
                                      schema: StructType) {
  private def idx(name: String): Option[Int] =
    schema.fields.indexWhere(_.name.equalsIgnoreCase(name)) match {
      case -1 => None
      case i  => Some(i)
    }
  val valueIdx: Int = idx("value").getOrElse(throw new IllegalArgumentException(
    "Required attribute 'value' not found"))
  val keyIdx: Option[Int] = idx("key")
  val topicIdx: Option[Int] = idx("topic")
  val partitionIdx: Option[Int] = idx("partition")
  require(topicOpt.isDefined || topicIdx.isDefined,
    "topic option required when no 'topic' attribute is present")
  def bytesAt(row: InternalRow, i: Int): Array[Byte] =
    if (row.isNullAt(i)) null
    else schema.fields(i).dataType match {
      case BinaryType => row.getBinary(i)
      case StringType => row.getUTF8String(i).getBytes
      case dt => throw new IllegalArgumentException(
        s"${schema.fields(i).name} attribute type must be a String or Binary, got $dt")
    }
}

private final class EmuWriterFactory(info: EmuWriteInfo)
    extends StreamingDataWriterFactory with DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    createWriter(partitionId, taskId)
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // appends happen at write() time, pre-commit — the producer's
      // at-least-once: a task retry re-sends its prefix
      override def write(row: InternalRow): Unit = {
        val topic = info.topicIdx match {
          case Some(i) if !row.isNullAt(i) => row.getUTF8String(i).toString
          case _ => info.topicOpt.getOrElse(
            throw new IllegalArgumentException("null topic present in the data"))
        }
        val key = info.keyIdx.map(info.bytesAt(row, _)).orNull
        val value = info.bytesAt(row, info.valueIdx)
        val part = info.partitionIdx.collect {
          case i if !row.isNullAt(i) => row.getInt(i)
        }
        EmulatedBroker.send(info.servers, topic, key, value, part)
      }
      override def commit(): WriterCommitMessage = EmuCommit
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

private case object EmuCommit extends WriterCommitMessage
