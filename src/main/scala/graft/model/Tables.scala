package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md / FIXTURES.md).
  *
  * Reads are plain `spark.read.parquet` so Catalyst gets a full
  * `FileSourceScanExec`: column pruning and filter pushdown reach the scan
  * (the reference declares a fixed schema for its stream source,
  * reference: spark_processor/processor.py:43-52; for parquet the footer
  * schema is authoritative and explicit StructTypes would only disable
  * schema evolution).
  *
  * At 100 TB these would be partitioned/bucketed tables behind the same
  * function signature — every operator downstream is written
  * partition-count-agnostic so nothing here changes with scale.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Round-robin repartition up to the session's default parallelism when
    * the source scan yields fewer splits. Single-file/single-row-group
    * inputs (the small-SF testdata) otherwise run all downstream per-row
    * compute on ONE task regardless of core count. At production scale the
    * scan has thousands of splits and this is a no-op — no shuffle is added
    * where the input is already parallel. Only applied in front of
    * CPU-heavy per-row stages (minhash/simhash signatures, vector math)
    * where the shuffle cost is far below the compute it parallelizes.
    */
  def balanced(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // Estimate the scan's partition count the way FilePartition packs
    // splits — ceil((bytes + nFiles·openCost) / maxPartitionBytes) — from
    // the file listing alone: unlike `df.rdd` this never materializes the
    // RDD lineage (AQE still owns the plan), and unlike a raw file COUNT it
    // is correct in both directions (many small files pack into few
    // partitions; one big file splits into many).
    val conf = spark.sessionState.conf
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val files = df.inputFiles
    val totalCost = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(hadoopConf).getFileStatus(p).getLen + conf.filesOpenCostInBytes
    }.sum
    val estPartitions =
      math.max(1L, (totalCost + conf.filesMaxPartitionBytes - 1) / conf.filesMaxPartitionBytes)
    if (estPartitions < target) df.repartition(target) else df
  }

  /** Lineage cut for iterative/multi-use intermediates: a RELIABLE
    * checkpoint when the session has a checkpoint dir configured (survives
    * executor loss — localCheckpoint blocks die with their executor, which
    * kills a long fixpoint job on a real cluster), localCheckpoint
    * otherwise (single-JVM tests/bench, where reliability adds only I/O).
    * Checkpoint files are reclaimed when the DataFrame is GC'd IF
    * `spark.cleaner.referenceTracking.cleanCheckpoints` is on —
    * [[graft.GraftSession]] sets it; without it they accumulate forever.
    */
  def ckpt(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint(true)

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** `events.ts` normalized to session-zone TimestampType whatever the
    * parquet file declares — fixture generations have varied:
    *
    *  - TIMESTAMP(NANOS): Spark 4 has no native type for it — it either
    *    throws PARQUET_TYPE_ILLEGAL or, with the legacy conf, reads INT64
    *    nanos. We read nanos and truncate to microsecond TimestampType with
    *    integer arithmetic (`div`, not double division — epoch-nanos ≈
    *    1.7e18 exceeds double's 2^53 integer range).
    *  - TIMESTAMP(µs, isAdjustedToUTC=false): Spark 4 infers
    *    TIMESTAMP_NTZ, on which `unix_micros`/epoch casts are type errors.
    *    Cast to TimestampType — the session zone is pinned to UTC
    *    ([[graft.GraftSession]]), so the wall-clock instant is unchanged
    *    and DuckDB (which reads the same values as naive timestamps)
    *    still agrees bit-for-bit.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Case class for the reference's wire-format trade event
    * (reference: producer/producer.py:51-58): price/quantity arrive as
    * decimal strings, trade_time as epoch millis.
    */
  final case class Trade(
      trade_id: Long,
      symbol: String,
      price: String,
      quantity: String,
      trade_time: Long,
      is_buyer_maker: Boolean)
}
