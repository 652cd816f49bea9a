package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Interleaved A/B for the copurchase_pairs / basket_lift pair-generation
  * shapes (r17): A = r16 distinct + self-join (pair expansion runs on the
  * exchange, 32-way); B = groupBy(ok) collect_set + ordered-pair explode.
  * Unlike copurchaseEdges (where the self-join ran on the 3-split scan and
  * B won 2.00→1.24), these ops shuffled BEFORE joining, so A was already
  * parallel — measure, don't assume. Usage: PairsAb <sfDir> [rounds]
  */
object PairsAb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val n = if (args.length > 1) args(1).toInt else 5

    def tail(pairs: DataFrame): DataFrame = pairs
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 2)
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(100)
    def a(): DataFrame = {
      val items = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val x = items.select(col("l_orderkey"), col("l_partkey").as("part_a"))
      val y = items.select(col("l_orderkey").as("ok_b"), col("l_partkey").as("part_b"))
      tail(x.join(y, col("l_orderkey") === col("ok_b") && col("part_a") < col("part_b"))
        .select(col("part_a"), col("part_b")))
    }
    def b(): DataFrame =
      tail(Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(expr(
          """flatten(transform(ps, (a, i) ->
            |  transform(slice(ps, i + 2, size(ps) - i - 1), b ->
            |    named_struct('part_a', a, 'part_b', b))))""".stripMargin)).as("p"))
        .select(col("p.part_a").as("part_a"), col("p.part_b").as("part_b")))

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(s"[ab] identity: " +
      s"${a().exceptAll(b()).count()} ${b().exceptAll(a()).count()} (0 0 expected)")
    time(a _); time(b _)
    val as = collection.mutable.ArrayBuffer[Double]()
    val bs = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to n) { as += time(a _); bs += time(b _) }
    println(f"[ab] A selfjoin  min ${as.min}%.2f  ${as.map(t => f"$t%.2f").mkString(" ")}")
    println(f"[ab] B set+expl  min ${bs.min}%.2f  ${bs.map(t => f"$t%.2f").mkString(" ")}")
    spark.stop()
  }
}
