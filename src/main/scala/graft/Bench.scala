package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract). Uses all local cores by default
  * (the driver's harness is local[32]); an untimed warmup pass absorbs
  * JVM/codegen JIT so per-query numbers reflect steady-state.
  *
  * Noise control: each query is timed over `SPARK_GRAFT_BENCH_N` passes
  * (default 3) and the reported per-query number is the MEDIAN, with
  * min/max surfaced alongside — this box runs other tenants and single
  * cold samples inflate 2-5x, so round-over-round comparisons are only
  * meaningful on medians.
  *
  * Load-drift sentinel: after the timed sweep, ONE fixed probe query is
  * re-timed and compared against its own median from the sweep. A ratio
  * > 2x in either direction means ambient load shifted mid-run and the
  * artifact self-identifies as noisy (`"noisy_run":true`) — a
  * round-over-round reader should prefer `queries_min` over the medians
  * before chasing an apparent regression (BENCH_r05 recorded 5-10x
  * tenant-load inflation on several queries that were unchanged).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Queries are driven through a NOOP WRITE, not count(): count prunes
    // every projected expression it doesn't need, so map-only operators
    // would be timed as bare scans. The noop sink evaluates the plan's
    // full output. (Rounds 1-3 used count(); per-query numbers for
    // projection-heavy map-only ops are honestly HIGHER from round 4 on.)
    def run(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    // Warm pass: run every query once untimed. First evaluation of a plan
    // pays Janino codegen compile + JVM JIT of its expression trees —
    // driver-side fixed costs independent of data volume (measured ~7 s on
    // the heaviest expression trees vs <2 s steady-state). The timed passes
    // then measure steady-state throughput, which is what scales with SF.
    SparkEntry.queries.foreach { case (_, fn) =>
      try run(fn) catch { case _: Throwable => () }
    }
    // n timed passes per query (query-major so each query's samples are
    // back-to-back — comparable load conditions within a sample set)
    val samples: Map[String, Seq[Double]] = SparkEntry.queries.map { case (name, fn) =>
      name -> (1 to n).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { run(fn); true }
                 catch { case _: Throwable => false }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
    }
    // -1.0 marks a failed pass. Median/min/max are computed over the
    // successful passes only (mixing the sentinel into min/max made the
    // per-query envelope ambiguous); a query is reported -1.0 only when
    // every pass failed. failures counts failed passes per query.
    def ok(xs: Seq[Double]): Seq[Double] = xs.filter(_ >= 0)
    def median(xs: Seq[Double]): Double = {
      val s = ok(xs).sorted
      if (s.isEmpty) -1.0 else s(s.length / 2)
    }
    val med = samples.map { case (k, v) => k -> median(v) }
    def fmt(m: Map[String, Double]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val mins = samples.map { case (k, v) => k -> ok(v).minOption.getOrElse(-1.0) }
    val maxs = samples.map { case (k, v) => k -> ok(v).maxOption.getOrElse(-1.0) }
    val fails = samples.collect { case (k, v) if v.exists(_ < 0) => k -> (v.count(_ < 0)) }
    val failStr = fails.map { case (k, c) => s"\"" + k + "\":" + c }.mkString("{", ",", "}")
    val total = med.values.filter(_ >= 0).sum
    // Post-run drift probe: re-time one fixed mid-weight query and compare
    // against its sweep median. The probe runs LAST, so a load spike that
    // arrived mid-sweep (inflating later samples) or departed (deflating
    // the probe) shows up as a ratio far from 1.
    val probeName = "ohlcv_1min"
    val drift: Option[(Double, Double)] =
      SparkEntry.queries.get(probeName).flatMap { fn =>
        val warm = med.getOrElse(probeName, -1.0)
        if (warm <= 0) None
        else {
          val t0 = System.nanoTime()
          val ok = try { run(fn); true } catch { case _: Throwable => false }
          if (!ok) None
          else {
            val probe = (System.nanoTime() - t0) / 1e9
            Some((probe, probe / warm))
          }
        }
      }
    val driftStr = drift match {
      case Some((probe, ratio)) =>
        val noisy = ratio > 2.0 || ratio < 0.5
        s""""drift_probe":"$probeName","drift_probe_sec":$probe,""" +
          s""""drift_ratio":$ratio,"noisy_run":$noisy,"""
      case None => s""""drift_probe":null,"noisy_run":null,"""
    }
    // Headline keys LAST: the driver's artifact keeps only the tail of a
    // long line, so the total / failed_passes / sf must survive truncation
    // (rounds 1-4 led with "value" and the artifact lost the total).
    val line = s"""{"metric":"total","unit":"sec","n":$n,"sink":"noop",""" +
      s""""queries":${fmt(med)},"queries_min":${fmt(mins)},""" +
      s""""queries_max":${fmt(maxs)},""" +
      s""""failed_passes":$failStr,$driftStr"sf":"$sfDir","value":$total}"""
    // Stop the session BEFORE printing so the JSON line is the final stdout
    // line of the run (Spark logs go to stderr; sbt's own trailing
    // "[success]" summary is suppressed in build.sbt for the same reason).
    try spark.stop() catch { case _: Throwable => () }
    println(line)
  }
}
