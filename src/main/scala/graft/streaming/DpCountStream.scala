package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.QualityOps

/** Differentially-private counting under CONTINUAL OBSERVATION — the
  * binary mechanism (Chan-Shi-Song 2011; Dwork-Naor-Pitassi-Rothblum
  * 2010), the canonical streaming-DP primitive: a telemetry pipeline
  * must publish a RUNNING count at every step without letting the
  * sequence of releases reveal any individual arrival. Releasing
  * independently-noised prefix counts costs Θ(√T) noise; the binary
  * mechanism instead noises each node of a dyadic interval tree ONCE,
  * and the release at step t sums the ≤ ⌊log₂ t⌋+1 noisy nodes whose
  * disjoint intervals tile [1, t] — O(log t) noise terms total, each
  * datum touching ≤ log T nodes (ε·log T budget by composition,
  * surfaced per release as `epsilon_spent_q6`).
  *
  * Per-key state is the textbook α/α̂ ladder: at step t the completing
  * level is the lowest set bit of t, its raw partial absorbs the lower
  * levels, and its noise is drawn once from the SAME exact-rational
  * two-sided-geometric ladder as the batch DP lane
  * ([[graft.ops.QualityOps.DpThresholds]]) under the lane's stated
  * TEST-MODE noise contract: u = a deterministic hash of
  * (key, level, node index) — replayable by the spec to the bit;
  * production swaps one line for a real RNG. True counts never leave
  * the state store.
  *
  * Step semantics, stated loudly: one micro-batch = one step per key
  * (the trigger IS the release cadence). Unlike the census twins, the
  * release SEQUENCE genuinely depends on how arrivals batch — that is
  * inherent to continual observation, not an implementation choice —
  * so the spec pins exact equality against a straight-line replay of
  * the same batch sequence (plus restart recovery), not batching
  * invariance.
  *
  * Scale/state posture: O(log T) longs per key — 64 levels cover every
  * reachable step count (t is a Long incremented once per trigger, so
  * the highest completing level is numberOfTrailingZeros(2^62) = 62;
  * the boundary step t = 2^32, where 32-length ladders would index out
  * of range, is in-range by 30 bits of margin) — keyed state shuffles
  * only (source, batch-count) pairs, never rows.
  */
object DpCountStream {

  /** Per-key state: step counter + the α (raw) and α̂ (noisy) level
    * ladders. Raw partials stay inside the state store.
    */
  final case class BmState(t: Long, alpha: Array[Long], alphaHat: Array[Long])

  final case class Release(
      source: String, step: Long, noisy_prefix: Long, n_levels: Int,
      epsilon_spent_q6: Long, noise_bound: Int)

  private val MaxLevels = 64

  /** Deterministic per-key seed (test-mode noise contract): a stable
    * fold of the key string, mixed with (level, node index) below.
    */
  private[graft] def keySeed(source: String): Long =
    source.foldLeft(7L)((a, c) => a * 131L + c)

  /** One geometric draw from the batch lane's exact-rational ladder —
    * the pure-Scala twin of [[graft.ops.QualityOps.dpCount]]'s column
    * fold, shared constants so the mechanisms are provably the same.
    */
  private[streaming] def geoNoise(seed: Long): Long = {
    val p = QualityOps.DpHashP
    val h = java.lang.Math.floorMod(
      java.lang.Math.floorMod(seed, p) * 2654435761L % p, p)
    val x = h * (3L * (1L << QualityOps.DpNoiseBound))
    QualityOps.DpThresholds.count(x >= _).toLong - QualityOps.DpNoiseBound
  }

  /** Advance one step: absorb `x` arrivals, complete the lowest-set-bit
    * level, draw its noise once, and release Σ of the set-bit α̂ levels.
    * Pure function of (state, key, x) — the spec replays it verbatim.
    */
  private[graft] def step(st: BmState, src: String, x: Long): (BmState, Release) = {
    val t = st.t + 1
    // copyOf, not clone: state restored from a pre-r14 checkpoint carries
    // 32-length ladders (MaxLevels was 32 then) — pad with zero levels so
    // the t = 2^32 boundary fix applies to RESUMED keys too, not only to
    // state created under this build
    val alpha = java.util.Arrays.copyOf(st.alpha, MaxLevels)
    val alphaHat = java.util.Arrays.copyOf(st.alphaHat, MaxLevels)
    val i = java.lang.Long.numberOfTrailingZeros(t)
    var acc = x
    var j = 0
    while (j < i) { acc += alpha(j); alpha(j) = 0L; alphaHat(j) = 0L; j += 1 }
    alpha(i) = acc
    // node identity: (key, level, index of the completed dyadic block)
    val seed = (keySeed(src) * 1000003L + i.toLong) * 1000003L + (t >> i)
    alphaHat(i) = acc + geoNoise(seed)
    var rel = 0L
    var levels = 0
    var k = 0
    while (k < MaxLevels) {
      if (((t >> k) & 1L) == 1L) { rel += alphaHat(k); levels += 1 }
      k += 1
    }
    (BmState(t, alpha, alphaHat),
      Release(src, t, rel, levels,
        levels.toLong * QualityOps.DpEpsilonQ6, QualityOps.DpNoiseBound))
  }

  /** `docs` — a streaming frame carrying a `source` column — to one
    * private running-count release per key per trigger (update mode).
    */
  def releases(docs: DataFrame): Dataset[Release] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.selectExpr("source").as[String]
      .groupByKey(identity)
      .flatMapGroupsWithState[BmState, Release](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[String], state: GroupState[BmState]) =>
          val x = rows.size.toLong
          val st = state.getOption.getOrElse(
            BmState(0L, new Array[Long](MaxLevels), new Array[Long](MaxLevels)))
          val (next, release) = step(st, src, x)
          state.update(next)
          Iterator.single(release)
      }
  }
}
