package graft

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.DataFrame

import graft.ops.QualityOps
import graft.streaming.DpCountStream

/** The continual-observation counter against a straight-line replay: a
  * fixed sequence of micro-batches must produce EXACTLY the releases
  * the textbook binary mechanism computes (same ladder noise, same
  * dyadic completion order), the released sequence must stay within the
  * mechanism's error envelope of the true prefix counts, and the query
  * must resume correctly from a checkpoint mid-sequence.
  */
class DpCountStreamSpec extends SparkSuite {

  /** Independent replay: the textbook algorithm written flat, with the
    * ladder CDF inverted from first principles (BigInt rationals, the
    * LinkStatsSpec dp_count discipline) — shared constants, no shared
    * step code path beyond the public seed definition.
    */
  private def replay(src: String, xs: Seq[Long]): Seq[Long] = {
    val B = QualityOps.DpNoiseBound
    def noise(seed: Long): Long = {
      val p = QualityOps.DpHashP
      val h = BigInt(seed).mod(p) * BigInt(2654435761L) % p
      val x = h * (3L * (1L << B))
      QualityOps.DpThresholds.count(s => x >= BigInt(s)).toLong - B
    }
    val alpha = new Array[Long](32)
    val alphaHat = new Array[Long](32)
    xs.zipWithIndex.map { case (x, idx) =>
      val t = idx + 1L
      val i = java.lang.Long.numberOfTrailingZeros(t)
      var acc = x
      for (j <- 0 until i) { acc += alpha(j); alpha(j) = 0; alphaHat(j) = 0 }
      alpha(i) = acc
      val seed = (DpCountStream.keySeed(src) * 1000003L + i) * 1000003L + (t >> i)
      alphaHat(i) = acc + noise(seed)
      (0 until 32).filter(k => ((t >> k) & 1L) == 1L).map(alphaHat(_)).sum
    }
  }

  test("releases match the textbook replay; error stays in the log-envelope; restart resumes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // two sources with different per-batch arrival counts
    val batches: Seq[Seq[String]] = Seq(
      Seq.fill(3)("a") ++ Seq.fill(5)("b"),
      Seq.fill(7)("a") ++ Seq.fill(1)("b"),
      Seq.fill(2)("a") ++ Seq.fill(9)("b"),
      Seq.fill(4)("a") ++ Seq.fill(4)("b"),
      Seq.fill(6)("a") ++ Seq.fill(2)("b"))
    val ckpt = java.nio.file.Files.createTempDirectory("dpcs_ckpt").toString

    val out = mutable.ArrayBuffer[(String, Long, Long, Int, Long)]()
    def startQuery(input: MemoryStream[String]) =
      DpCountStream.releases(input.toDF().toDF("source")).toDF().writeStream
        .outputMode("update")
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.collect().foreach { r =>
            out += ((r.getAs[String]("source"), r.getAs[Long]("step"),
              r.getAs[Long]("noisy_prefix"), r.getAs[Int]("n_levels"),
              r.getAs[Long]("epsilon_spent_q6")))
          }
          ()
        }
        .trigger(Trigger.ProcessingTime(0))
        .option("checkpointLocation", ckpt)
        .start()

    // run the first three steps, STOP, then resume from the checkpoint
    val input = MemoryStream[String]
    val q1 = startQuery(input)
    try {
      batches.take(3).foreach { b => input.addData(b); q1.processAllAvailable() }
    } finally q1.stop()
    batches.drop(3).foreach(input.addData(_))
    val q2 = startQuery(input)
    try q2.processAllAvailable() finally q2.stop()

    // NOTE on resume semantics: the two post-restart batches were added
    // while no query ran, so the restarted query may drain them as ONE
    // micro-batch = one step (continual observation is step-indexed —
    // the contract, stated in the op doc). Reconstruct the effective
    // per-source step sequence from the observed steps.
    val bySrc = out.groupBy(_._1)
    for (src <- Seq("a", "b")) {
      val obs = bySrc(src).sortBy(_._2)
      val steps = obs.map(_._2)
      assert(steps == (1L to steps.length.toLong), s"$src steps not contiguous: $steps")
      // recover the per-step arrival counts the engine actually saw:
      // steps 1..3 are the exact first three batches; later steps are
      // drains of the remaining batches in order
      val perBatch = batches.map(_.count(_ == src).toLong)
      val xs: Seq[Long] =
        if (steps.length == 5) perBatch
        else perBatch.take(3) ++ Seq(perBatch.drop(3).sum)
      val expect = replay(src, xs)
      assert(obs.map(_._3) == expect, s"$src releases diverged from replay")
      // error envelope: each release sums n_levels noisy nodes, each
      // within ±B of its true partial — so |release − true prefix| ≤ B·levels
      val truePrefix = xs.scanLeft(0L)(_ + _).tail
      for (((rel, lvls, eps), tp) <- obs.map(r => (r._3, r._4, r._5)).zip(truePrefix)) {
        assert(math.abs(rel - tp) <= QualityOps.DpNoiseBound.toLong * lvls,
          s"$src release $rel strayed past the envelope of $tp")
        assert(eps == lvls.toLong * QualityOps.DpEpsilonQ6)
      }
      // the mechanism genuinely perturbs: some release differs from truth
      assert(obs.map(_._3) != truePrefix, s"$src releases exactly true — noise vacuous")
    }
  }

  test("boundary step t = 2^32 completes level 32 without indexing out of the ladder") {
    // r13 ADVICE: with 32-length ladders, numberOfTrailingZeros(2^32) = 32
    // threw ArrayIndexOutOfBounds and the release loop ignored bit 32.
    // Drive step() directly at the boundary: state at t = 2^32 − 1 with
    // every lower level holding one arrival; the next step must fold all
    // 32 partials into level 32 and release exactly that one noisy node.
    val levels = 64
    val alpha = Array.tabulate(levels)(j => if (j < 32) 1L else 0L)
    val st = DpCountStream.BmState((1L << 32) - 1, alpha, alpha.clone())
    val (st2, rel) = DpCountStream.step(st, "edge", 1L)
    assert(st2.t == (1L << 32))
    assert(rel.n_levels == 1, "only bit 32 is set at t = 2^32")
    val seed = (DpCountStream.keySeed("edge") * 1000003L + 32L) * 1000003L + 1L
    val p = QualityOps.DpHashP
    val h = BigInt(seed).mod(p) * BigInt(2654435761L) % p
    val x = h * (3L * (1L << QualityOps.DpNoiseBound))
    val noise = QualityOps.DpThresholds.count(s => x >= BigInt(s)).toLong -
      QualityOps.DpNoiseBound
    assert(rel.noisy_prefix == 33L + noise,
      "release at the boundary must be the single level-32 noisy node")
    assert((0 until 32).forall(st2.alpha(_) == 0L), "lower levels must reset")
    assert(st2.alpha(32) == 33L)
  }

  test("state restored from a pre-r14 checkpoint (32-length ladders) is padded, not crashed") {
    // old-build state: arrays of length 32, parked one step before the
    // boundary — step() must pad to the widened ladder and complete
    // level 32 exactly as with native 64-length state
    val oldAlpha = Array.fill(32)(1L)
    val st = DpCountStream.BmState((1L << 32) - 1, oldAlpha, oldAlpha.clone())
    val (st2, rel) = DpCountStream.step(st, "edge", 1L)
    assert(st2.alpha.length == 64 && st2.alpha(32) == 33L && rel.n_levels == 1)
  }
}
