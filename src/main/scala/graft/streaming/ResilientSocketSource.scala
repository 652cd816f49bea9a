package graft.streaming

import java.io.{BufferedReader, InputStreamReader}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Reconnecting TCP line source — the dev/drill entry point hardened with
  * the reference producer's resilience loop (producer/producer.py:100-115:
  * reconnect forever, delay doubling `min(delay * 2, max)`, never give up).
  *
  * Why a custom DataSource V2 source instead of supervising the in-box
  * `socket` source: Spark's TextSocket reader thread treats BOTH a clean
  * peer close (EOF) and an IO error as a silent end — the streaming query
  * stays alive with a permanently dead feed, so no query-level supervisor
  * (awaitTermination + restart) can ever observe the drop. The reconnect
  * loop has to live INSIDE the source's read thread, which is exactly
  * where the reference puts it (`ws.run_forever()` wrapped in the retry
  * loop). Each line is tagged with the 0-based connection epoch that
  * delivered it, so downstream observability can count drops.
  *
  * Scale posture: like the in-box socket source this buffers on the
  * driver and offers NO replay — it is the dev entry; production
  * ingestion is [[OhlcvStream.fromKafka]]'s replayable log. Committed
  * prefixes are truncated each micro-batch, so driver memory holds only
  * the un-committed tail.
  *
  * Usage: `spark.readStream.format(classOf[ResilientSocketProvider]
  * .getName).option("host", h).option("port", p).load()` or
  * [[OhlcvStream.fromResilientSocket]].
  */
class ResilientSocketProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ResilientSocketProvider.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new ResilientSocketTable(new CaseInsensitiveStringMap(properties))
}

object ResilientSocketProvider {
  /** `value` = one line; `conn_epoch` = which connection (0-based) carried
    * it — increments on every reconnect, the drop counter for monitoring.
    */
  val Schema: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("conn_epoch", IntegerType, nullable = false)))
}

private[streaming] final class ResilientSocketTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val host = options.get("host")
  private val port = options.getInt("port", -1)
  private val retryDelayMs = options.getLong("retryDelayMs", 500L)
  private val maxRetryDelayMs = options.getLong("maxRetryDelayMs", 60000L)
  require(host != null && port > 0, "resilient socket source needs host and port")

  override def name(): String = s"ResilientSocket($host:$port)"
  override def schema(): StructType = ResilientSocketProvider.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = ResilientSocketProvider.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ResilientSocketStream(host, port, retryDelayMs, maxRetryDelayMs)
      }
    }
}

/** Offset = count of lines enqueued since stream start (monotone long). */
private[streaming] final case class LineCountOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[streaming] final class ResilientSocketStream(
    host: String, port: Int, retryDelayMs: Long, maxRetryDelayMs: Long)
    extends MicroBatchStream {

  // buffered (line, epoch) pairs for offsets [base, base + buffer.size);
  // all three fields guarded by `this`
  private val buffer = new ArrayBuffer[(String, Int)]()
  private var base = 0L
  private val stopped = new AtomicBoolean(false)
  @volatile private var socket: Socket = _
  @volatile private[streaming] var epoch = 0

  private val readThread = new Thread(s"resilient-socket-$host:$port") {
    setDaemon(true)
    override def run(): Unit = {
      var delay = retryDelayMs
      while (!stopped.get()) {
        try {
          val s = new Socket(host, port)
          socket = s
          val in = new BufferedReader(
            new InputStreamReader(s.getInputStream, StandardCharsets.UTF_8))
          var line = in.readLine()
          while (line != null && !stopped.get()) {
            ResilientSocketStream.this.synchronized { buffer += ((line, epoch)) }
            line = in.readLine()
          }
          s.close()
        } catch { case _: Exception => () } // connect refused / reset / EOF: all retry
        if (!stopped.get()) {
          epoch += 1 // a new connection attempt begins a new epoch
          try Thread.sleep(delay)
          catch { case _: InterruptedException => return }
          delay = math.min(delay * 2, maxRetryDelayMs) // producer.py:115
        }
      }
    }
  }
  readThread.start()

  override def initialOffset(): Offset = LineCountOffset(0L)
  override def latestOffset(): Offset =
    synchronized { LineCountOffset(base + buffer.size) }
  override def deserializeOffset(json: String): Offset =
    LineCountOffset(json.toLong)

  override def commit(end: Offset): Unit = synchronized {
    val upTo = end.asInstanceOf[LineCountOffset].n
    val drop = math.max(0L, math.min(upTo - base, buffer.size.toLong)).toInt
    buffer.remove(0, drop)
    base += drop
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[LineCountOffset].n,
      end.asInstanceOf[LineCountOffset].n)
    val rows = synchronized {
      buffer.slice(math.max(0L, s - base).toInt, math.max(0L, e - base).toInt)
        .toArray
    }
    if (rows.isEmpty) Array.empty else Array(LinesPartition(rows))
  }

  override def createReaderFactory(): PartitionReaderFactory = LinesReaderFactory

  override def stop(): Unit = {
    stopped.set(true)
    readThread.interrupt()
    val s = socket
    if (s != null) { try s.close() catch { case _: Exception => () } }
  }
}

private[streaming] final case class LinesPartition(rows: Array[(String, Int)])
    extends InputPartition

private[streaming] object LinesReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[LinesPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val (line, ep) = rows(i)
        new GenericInternalRow(Array[Any](UTF8String.fromString(line), ep))
      }
      override def close(): Unit = ()
    }
  }
}
