package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Tables

/** Storage-layout operators — the two table-layout levers that decide
  * whether a 100 TB join/scan is feasible at all:
  *
  *  - '''Bucketed co-located join''': both fact tables are written
  *    `bucketBy(N, key)` + `sortBy(key)`, so an equi-join on the bucket key
  *    needs NO shuffle on either side — each task merge-joins bucket i of
  *    both tables in place. At 100 TB this is the difference between
  *    re-shuffling terabytes per join and zero network traffic; the
  *    write-side bucketing cost amortizes over every downstream join.
  *    (PlanSpec pins the exchange-free shape.)
  *
  *  - '''Partition pruning''': the fact table is written
  *    `partitionBy(col)`; a predicate on the partition column eliminates
  *    whole directories at PLANNING time — the scan never opens a pruned
  *    file, so a selective filter reads 1/k of the table instead of
  *    filtering rows post-read. (PlanSpec asserts the pruned scan.)
  *
  * Both ops build their layout ONCE per corpus (fingerprint-keyed memo, the
  * same index-build/query split as [[SimilarityOps]]' IVF centroids) and
  * then answer queries through the layout; the oracle runs the equivalent
  * SQL over the RAW parquet, proving layout changes never change results.
  */
object StorageOps {

  private val built = new ConcurrentHashMap[String, String]()

  /** (path, length, mtime) fingerprint of a source table's files — cache
    * keys the derived layout to the DATA, so a refreshed corpus rebuilds.
    */
  private def fingerprint(spark: SparkSession, dir: String, table: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val df = if (table == "events") Tables.events(spark, dir)
             else Tables.table(spark, dir, table)
    df.inputFiles.sorted.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val st = p.getFileSystem(conf).getFileStatus(p)
      s"$f:${st.getLen}:${st.getModificationTime}"
    }.mkString("|")
  }

  /** Build-once catalog table derived from (dir, source table): the table
    * name embeds the corpus fingerprint hash so distinct SF dirs (or
    * refreshed data) in one JVM get distinct tables; the memo skips repeat
    * existence checks. A fresh JVM starts with an empty in-memory catalog
    * but the warehouse DIRECTORY survives on disk — `saveAsTable` refuses
    * that orphan location (LOCATION_ALREADY_EXISTS; `overwrite` only drops
    * locations of tables the catalog knows), so delete it before building.
    */
  private def ensure(spark: SparkSession, dir: String, source: String,
                     base: String)(build: String => Unit): String = {
    val key = s"$dir#$base#${fingerprint(spark, dir, source)}"
    built.computeIfAbsent(key, { k =>
      // 64 hex bits of SHA-256, not String.hashCode: with a 31-bit name a
      // colliding (dir, fingerprint) pair would silently SERVE THE OTHER
      // CORPUS'S TABLE (tableExists short-circuits the build)
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(k.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      val tbl = base + "_" + digest
      if (!spark.catalog.tableExists(tbl)) {
        val loc = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir") + "/" + tbl)
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
        build(tbl)
      }
      tbl
    })
  }

  /** Orders ⋈ lineitem on the order key with BOTH sides bucketed (and
    * per-file sorted) on that key: the executed plan is a sort-merge join
    * with no Exchange on either input — the only shuffle in the query is
    * the final 3-group aggregation. Revenue aggregates in DECIMAL (exact,
    * order-independent) and crosses the output boundary as DOUBLE.
    */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val oT = ensure(spark, dir, "orders", "graft_orders_bkt") { tbl =>
      Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderstatus"))
        .write.format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(tbl)
    }
    val lT = ensure(spark, dir, "lineitem", "graft_lineitem_bkt") { tbl =>
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .write.format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(tbl)
    }
    val disc = col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1) - col("l_discount").cast(DecimalType(18, 2)))
    spark.table(oT)
      .join(spark.table(lT), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(disc).cast(DoubleType).as("revenue"))
  }

  /** Events partitioned by event_type; the `event_type = 'click'` predicate
    * prunes sibling partitions at planning time (PartitionFilters on the
    * scan, zero data filters) — the scan reads ~1/5 of the table. Daily
    * click volume per partition-pruned scan; day crosses the boundary as a
    * string (DATE objects hash differently across engines) and value sums
    * in DECIMAL.
    */
  def partitionPrune(spark: SparkSession, dir: String): DataFrame = {
    val eT = ensure(spark, dir, "events", "graft_events_parted") { tbl =>
      Tables.events(spark, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("value"),
          col("event_type"))
        .write.format("parquet").partitionBy("event_type")
        .mode("overwrite").saveAsTable(tbl)
    }
    spark.table(eT)
      .filter(col("event_type") === "click")
      .groupBy(date_format(date_trunc("DAY", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(
        count(lit(1)).as("n_clicks"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("click_value"))
  }
}
