package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev profiler: run one registered query (warm + timed noop pass) and
  * print where the wall-clock went — per job and per stage, with shuffle
  * read/write volumes — from a SparkListener. This is the §1/§7.1 "open
  * the UI, find the slow stage" loop for a headless box: the same numbers
  * the Stages tab shows, printed.
  *
  * Usage: runMain graft.tools.ProfileQ <sfDir> <query> [passes]
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val passes = if (args.length > 2) args(2).toInt else 1
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    def run(): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()
    run() // warm: codegen + JIT

    case class Stage(id: Int, nameStr: String, ms: Long, tasks: Int,
                     shufReadMB: Double, shufWriteMB: Double, inputMB: Double)
    val jobs = mutable.LinkedHashMap[Int, (Long, mutable.ArrayBuffer[Int])]()
    val jobEnd = mutable.LinkedHashMap[Int, Long]()
    val stages = mutable.LinkedHashMap[Int, Stage]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs(e.jobId) = (e.time, mutable.ArrayBuffer(e.stageIds.map(_.toInt): _*))
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobEnd(e.jobId) = e.time
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val ms = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages(si.stageId) = Stage(si.stageId, si.name.takeWhile(_ != '\n'), ms,
          si.numTasks,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.inputMetrics.bytesRead / 1e6)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    (1 to passes).foreach(_ => run())
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500) // let the listener bus drain

    println(f"[prof] $name: $passes pass(es), wall ${wall}%.3f s")
    var jobSum = 0L
    jobs.foreach { case (jid, (t0j, sids)) =>
      val dur = jobEnd.get(jid).map(_ - t0j).getOrElse(-1L)
      jobSum += math.max(dur, 0)
      val ss = sids.flatMap(stages.get)
      val top = ss.sortBy(-_.ms).take(4).map(s =>
        f"stage${s.id}:${s.ms}ms/${s.tasks}t" +
          (if (s.shufReadMB > 0.05) f"/sr${s.shufReadMB}%.1fM" else "") +
          (if (s.shufWriteMB > 0.05) f"/sw${s.shufWriteMB}%.1fM" else "") +
          (if (s.inputMB > 0.05) f"/in${s.inputMB}%.1fM" else "")
      ).mkString(" ")
      println(f"[prof]   job $jid%3d ${dur}%6d ms  [$top]")
    }
    println(f"[prof] jobs total ${jobSum} ms of ${math.rint(wall * 1000).toLong} ms wall (gap = driver/planning)")
    spark.stop()
  }
}
