package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Tables

/** Throwaway A/B probe for link_prediction's wedge-leg plan (r14 task 1):
  * variant A re-derives the brand/degree-joined adjacency for both wedge
  * legs (the r13 shipped shape); variant B checkpoints it once. Interleaved
  * timed passes in ONE JVM so box drift cancels.
  *
  * DELIBERATELY a frozen inline snapshot of the two r13/r14 plan shapes,
  * not a call into StatsOps.linkPrediction: the comparison is historical
  * evidence for the r14 decision (BASELINE.md), and parameterizing the
  * shipped op with a variant flag would put a measurement knob in
  * production code. If linkPrediction's plan changes again, re-snapshot
  * here — do NOT cite this tool's numbers for the new shape unchanged.
  * Usage: LinkPredAb <sfDir> [n]
  */
object LinkPredAb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val n = if (args.length > 1) args(1).toInt else 3

    def build(ckptAdjb: Boolean): DataFrame = {
      val e = Tables.ckpt(graft.ops.StatsOps.copurchaseEdgesProbe(spark, dir))
      val adj = e.select(col("a").as("src"), col("b").as("dst"))
        .union(e.select(col("b").as("src"), col("a").as("dst")))
      val deg = adj.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val pb = Tables.part(spark, dir)
        .select(col("p_partkey").as("dst"), col("p_brand").as("brand"))
      val adjb0 = adj.join(broadcast(pb), "dst")
        .join(deg.withColumnRenamed("deg", "center_deg"), "src")
        .withColumn("ra_w", expr("CAST(1000000000000 AS BIGINT) div center_deg"))
      val adjb = if (ckptAdjb) Tables.ckpt(adjb0) else adjb0
      val cand = adjb.as("x").join(adjb.as("y"),
          col("x.src") === col("y.src") && col("x.brand") === col("y.brand")
            && col("x.dst") < col("y.dst"))
        .groupBy(col("x.dst").as("a"), col("y.dst").as("b"),
          col("x.brand").as("brand"))
        .agg(count(lit(1)).as("cn"), sum(col("x.ra_w")).as("ra_q12"))
        .join(e, Seq("a", "b"), "left_anti")
      cand
        .join(deg.select(col("src").as("a"), col("deg").as("deg_a")), "a")
        .join(deg.select(col("src").as("b"), col("deg").as("deg_b")), "b")
        .select(col("a"), col("b"), col("brand"), col("cn"),
          col("deg_a"), col("deg_b"),
          (col("cn").cast(DoubleType) /
            (col("deg_a") + col("deg_b") - col("cn")).cast(DoubleType))
            .as("jaccard"),
          col("ra_q12"))
        .orderBy(col("cn").desc, col("a"), col("b"))
        .limit(100)
    }
    def time(ckpt: Boolean): Double = {
      val t0 = System.nanoTime()
      build(ckpt).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(false); time(true) // warm both
    val as = collection.mutable.ArrayBuffer[Double]()
    val bs = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to n) { as += time(false); bs += time(true) }
    println(f"[ab] inline: ${as.map(t => f"$t%.2f").mkString(" ")}")
    println(f"[ab] ckpt:   ${bs.map(t => f"$t%.2f").mkString(" ")}")
    spark.stop()
  }
}
