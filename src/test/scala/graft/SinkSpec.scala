package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.model.Tables

/** Partitioned parquet sink + partition-pruned re-read: the write path a
  * 100 TB corpus actually uses (hive-style lang=… directories), and proof
  * that a reader's filter prunes partitions instead of scanning them.
  */
class SinkSpec extends SparkSuite {

  test("partitionBy write produces hive-style dirs; reads prune partitions") {
    val out = Files.createTempDirectory("part_sink").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").partitionBy("lang").parquet(out)

    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("lang=")), dirs.mkString(","))

    val filtered = spark.read.parquet(out).filter(col("lang") === "en")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
    // pruned read returns exactly the en rows, matching an unpartitioned count
    val expected = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("lang") === "en").count()
    assert(filtered.count() == expected)
  }

  test("bucketed table write co-locates join keys (bucket pruning metadata)") {
    Tables.orders(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite")
      .bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bucketed")
    try {
      val t = spark.table("orders_bucketed")
      assert(t.count() == 1500)
      // a groupBy on the bucket key over a bucketed table needs no exchange
      val agg = t.groupBy("o_custkey").count()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(o_custkey"), plan)
    } finally spark.sql("DROP TABLE IF EXISTS orders_bucketed")
  }
}
