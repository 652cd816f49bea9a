package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Interleaved A/B/C probe for the copurchase edge-list build (r17):
  *  A: r16 shipped shape — lineitem self-join on l_orderkey (BHJ), distinct;
  *     pair expansion runs at the scan's split count (3 tasks at sf0.1).
  *  B: A with Tables.balanced on the projected scan (32-way expansion).
  *  C: one groupBy(ok) collect_set + in-codegen ordered-pair explode +
  *     distinct — no join, no broadcast build, parallelism from the
  *     aggregation exchange itself.
  * All three produce the identical distinct (a < b) pair set.
  * Usage: EdgeBuildAb <sfDir> [rounds]
  */
object EdgeBuildAb {
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

    def base(balanced: Boolean): DataFrame = {
      val l0 = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      if (balanced) Tables.balanced(l0) else l0
    }
    def selfJoin(balanced: Boolean): DataFrame = {
      val l = base(balanced)
      l.as("x").join(l.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("a"), col("y.pk").as("b"))
        .distinct()
    }
    def setExplode(): DataFrame =
      base(balanced = false)
        .groupBy(col("ok")).agg(sort_array(collect_set(col("pk"))).as("ps"))
        .select(explode(expr(
          """flatten(transform(ps, (a, i) ->
            |  transform(slice(ps, i + 2, size(ps) - i - 1), b ->
            |    named_struct('a', a, 'b', b))))""".stripMargin)).as("p"))
        .select(col("p.a"), col("p.b"))
        .distinct()

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "A selfjoin      " -> (() => selfJoin(false)),
      "B selfjoin+bal  " -> (() => selfJoin(true)),
      "C set+explode   " -> (() => setExplode()))
    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // row-identity sanity: C must equal A exactly
    val a = selfJoin(false); val c = setExplode()
    val d1 = a.exceptAll(c).count(); val d2 = c.exceptAll(a).count()
    println(s"[ab] identity: A-C=$d1 C-A=$d2 (both must be 0)")
    variants.foreach { case (_, f) => time(f) } // warm
    val acc = variants.map(_ => collection.mutable.ArrayBuffer[Double]())
    for (_ <- 1 to n; i <- variants.indices) acc(i) += time(variants(i)._2)
    variants.zipWithIndex.foreach { case ((nm, _), i) =>
      println(f"[ab] $nm min ${acc(i).min}%.2f  ${acc(i).map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
