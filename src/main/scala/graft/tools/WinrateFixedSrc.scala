package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off r14 probe: source_winrate at sf10x with the SOURCE DIMENSION
  * HELD FIXED (strip the per-copy suffix the corpus derivation appends).
  * The deep probe's exp 1.18 second decade conflates corpus growth (100×)
  * with source-count growth (100× → 10⁴× pair matrix); production source
  * counts are dashboard-bounded, so this run isolates the corpus term.
  * Usage: WinrateFixedSrc <sf10xDir> <scratchOut> [baselineDir]
  * (baseline defaults to /root/testdata/sf0.1 and the printed exponent
  * assumes the 100× decade pair — pass the baseline explicitly on any
  * other layout).
  */
object WinrateFixedSrc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = args(1)
    if (!new java.io.File(s"$out/documents.parquet/_SUCCESS").exists()) {
      spark.read.parquet(s"${args(0)}/documents.parquet")
        .withColumn("source",
          regexp_replace(col("source"), "_\\d+$", ""))
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
    }
    def run(dir: String): Double = {
      graft.SparkEntry.queries("source_winrate")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("source_winrate")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val baseline = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val t01 = run(baseline)
    val t10 = run(out)
    println(f"[winrate] sf0.1 $t01%.2f s, sf10x-fixed-sources $t10%.2f s, exp ${math.log10(t10 / t01) / 2}%.2f")
    spark.stop()
  }
}
