package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.StringType

/** K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002; Beyer
  * et al. SIGMOD'07) as a typed [[Aggregator]] — the DETERMINISTIC,
  * cross-engine-reproducible alternative to HLL++ for the approx-distinct
  * lane. The state is the k smallest DISTINCT hash values of the input,
  * and "k smallest of a multiset" is a pure function of the value SET:
  * partial states merge associatively, commutatively, and idempotently,
  * so the result is identical under ANY partitioning / merge order —
  * unlike GK percentile summaries (merge-order defined) and unlike
  * engine-private HLL buffers. That determinism is what lets the estimate
  * be hash-checked against a DuckDB SQL replay (take the k-th smallest
  * distinct hash, apply the same closed-form estimator) instead of living
  * rows-only behind an envelope spec.
  *
  * Hash: the low 60 bits (15 hex digits) of md5 over an engine-stable
  * string rendering — md5 is bit-identical everywhere, and both Spark
  * (`conv(substr(md5(x),1,15),16,10)`) and DuckDB
  * (`('0x'||substr(md5(x),1,15))::BIGINT`) expose the same hex→int path.
  * Uniform on [0, 2^60); for n distinct values the expected k-th smallest
  * is k·2^60/(n+1), giving the unbiased estimator (k−1)·2^60 / h_(k).
  *
  * Exact regime: with fewer than k distinct inputs the sketch holds ALL
  * of them and reports the exact count — the estimator only engages at
  * ≥ k, where its relative error is ~1/√(k−2) (k=1024 → ~3.1%).
  *
  * IEEE parity of the estimate: (k−1)·2^60 is exactly representable (the
  * mantissa is k−1, ≤ 11 bits), long→double conversion of h_(k) is
  * round-to-nearest-even in both JVM and C++, and one division is
  * correctly rounded — both engines emit the identical double.
  *
  * Scale posture (100 TB): one pass, map-side partials, 8·(k+1) bytes of
  * state per (group × partition) — the shuffle carries sketches, never
  * values; md5 per row is compute-bounded and pipelines inside the scan.
  * Buffer is a sorted Array[Long] with a binary-search insert: once the
  * buffer fills, rows hashing above the current k-th minimum are rejected
  * by ONE comparison, so expected post-fill inserts are k·ln(n/k), not n.
  */
class KmvSketch(val k: Int)
    extends Aggregator[java.lang.Long, Array[Long], Double] {
  require(k >= 2, "KMV needs k >= 2")

  /** buf(0) = live count c; buf(1..c) = the c smallest distinct hashes,
    * ascending. Mutated in place (TypedImperativeAggregate keeps the
    * buffer live between rows; serialization only at shuffle).
    */
  override def zero: Array[Long] = new Array[Long](k + 1)

  override def reduce(b: Array[Long], a: java.lang.Long): Array[Long] = {
    if (a == null) return b
    val h = a.longValue
    val c = b(0).toInt
    if (c == k && h >= b(k)) return b // above the k-th minimum: reject
    // binary search in b[1..c]
    var lo = 1; var hi = c
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (b(mid) < h) lo = mid + 1
      else if (b(mid) > h) hi = mid - 1
      else return b // duplicate hash: state is a SET
    }
    val insertAt = lo
    val newC = if (c == k) k else c + 1
    // shift right, dropping the last entry when full
    System.arraycopy(b, insertAt, b, insertAt + 1, newC - insertAt)
    b(insertAt) = h
    b(0) = newC
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    val (c1, c2) = (b1(0).toInt, b2(0).toInt)
    // Defensive copies on the trivial-side fast paths: returning an input
    // by reference is safe under Spark's two-phase aggregate contract
    // (update never follows merge on the same buffer), but [[reduce]]
    // mutates buffers in place, so an aliased return handed back to
    // reduce by any OTHER caller (driver-side reuse, [[KmvMergeAgg]]
    // feeding a row's deserialized array) would corrupt shared state.
    // One k+1-long copy per trivial merge is noise next to the shuffle.
    if (c2 == 0) return java.util.Arrays.copyOf(b1, b1.length)
    if (c1 == 0) return java.util.Arrays.copyOf(b2, math.max(b2.length, k + 1))
    val out = new Array[Long](k + 1)
    var (i, j, o) = (1, 1, 0)
    while (o < k && (i <= c1 || j <= c2)) {
      val take =
        if (i > c1) { val v = b2(j); j += 1; v }
        else if (j > c2) { val v = b1(i); i += 1; v }
        else if (b1(i) < b2(j)) { val v = b1(i); i += 1; v }
        else if (b1(i) > b2(j)) { val v = b2(j); j += 1; v }
        else { val v = b1(i); i += 1; j += 1; v } // shared hash: once
      o += 1
      out(o) = take
    }
    out(0) = o
    out
  }

  // exact below k (sketch holds every distinct hash), closed form at k —
  // the ONE shared estimator definition
  override def finish(b: Array[Long]): Double = KmvSketch.estimate(b, k)

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Double] = org.apache.spark.sql.Encoders.scalaDouble
}

/** The KMV state itself as the aggregate output — the PARTIAL form for
  * two-level rollups ([[KmvMergeAgg]] consumes these): per-group sorted
  * arrays of the ≤k smallest distinct hashes, trimmed to occupancy so the
  * shuffle carries only live entries. The k-min-of-union identity (any
  * hash among a union's k smallest is among its part's k smallest) makes
  * merged partials EQUAL the direct sketch of the union — which is what
  * lets a rollup over these be hash-checked against raw data.
  */
class KmvStateAgg(val k: Int)
    extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
  private val inner = new KmvSketch(k)
  override def zero: Array[Long] = inner.zero
  override def reduce(b: Array[Long], a: java.lang.Long): Array[Long] =
    inner.reduce(b, a)
  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    inner.merge(b1, b2)
  override def finish(b: Array[Long]): Array[Long] =
    java.util.Arrays.copyOf(b, b(0).toInt + 1)
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** Union of [[KmvStateAgg]] partials → the distinct-count estimate of the
  * merged set. Rows are SKETCHES (one per upstream group), so a rollup
  * merge touches O(groups) arrays, never the raw values — the
  * [[graft.ops.StatsOps.hllPartialUnion]] architecture, but with a state
  * that is a pure function of the underlying value set, hence
  * hash-checkable.
  */
class KmvMergeAgg(val k: Int)
    extends Aggregator[Array[Long], Array[Long], Double] {
  private val inner = new KmvSketch(k)
  private def pad(a: Array[Long]): Array[Long] =
    if (a.length >= k + 1) a else java.util.Arrays.copyOf(a, k + 1)
  override def zero: Array[Long] = inner.zero
  override def reduce(b: Array[Long], a: Array[Long]): Array[Long] =
    if (a == null) b else inner.merge(b, pad(a))
  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    inner.merge(b1, b2)
  override def finish(b: Array[Long]): Double = KmvSketch.estimate(b, k)
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Double] = org.apache.spark.sql.Encoders.scalaDouble
}

object KmvSketch {
  /** 2^60 — the hash domain size; exactly representable as a double. */
  val EstNumerator: Double = 1152921504606846976.0

  /** The estimator over a (possibly trimmed) state array: exact count
    * below k, (k−1)·2^60/h_(k) at k. One shared definition for
    * [[KmvSketch.finish]], [[KmvMergeAgg.finish]], and [[overlap]].
    */
  def estimate(state: Array[Long], k: Int): Double = {
    val c = state(0).toInt
    if (c < k) c.toDouble
    else EstNumerator * (k - 1).toDouble / state(k).toDouble
  }

  /** Set-overlap estimates from two [[KmvStateAgg]] states (Beyer et al.
    * SIGMOD'07 §4): union the sketches (k-min-of-union identity ⇒ this IS
    * the union's sketch), estimate the union, count the union-sketch
    * hashes present in BOTH sides — membership in the side's RAW set and
    * in its sketch coincide for hashes ≤ the union's k-th minimum — and
    * Jaccard = shared/|union sketch|, intersection = Jaccard × union
    * estimate (one IEEE multiply of engine-identical doubles). Exact when
    * the union has < k distinct hashes. Returns
    * (n_a_est, n_b_est, union_est, shared, jaccard_est, intersect_est).
    */
  def overlap(a0: Array[Long], b0: Array[Long], k: Int):
      (Double, Double, Double, Long, Double, Double) = {
    val sk = new KmvSketch(k)
    def pad(x: Array[Long]) =
      if (x.length >= k + 1) x else java.util.Arrays.copyOf(x, k + 1)
    val a = pad(a0); val b = pad(b0)
    val u = sk.merge(a.clone(), b)
    val cu = u(0).toInt
    def has(s: Array[Long], h: Long): Boolean = {
      var lo = 1; var hi = s(0).toInt
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (s(mid) < h) lo = mid + 1
        else if (s(mid) > h) hi = mid - 1
        else return true
      }
      false
    }
    var shared = 0L
    var i = 1
    while (i <= cu) {
      if (has(a, u(i)) && has(b, u(i))) shared += 1
      i += 1
    }
    val unionEst = estimate(u, k)
    val jac = if (cu == 0) 0.0 else shared.toDouble / cu.toDouble
    (estimate(a, k), estimate(b, k), unionEst, shared, jac, jac * unionEst)
  }

  /** The shared hash column: top 60 bits of md5 over an engine-stable
    * rendering, via the native [[Md5Prefix60]] kernel (bit-identical to
    * `conv(substr(md5(x),1,15),16,10)`, ~2.6× cheaper — ApproxOpsSpec
    * pins the equivalence). NULL in → NULL out (the aggregator skips NULLs,
    * matching COUNT(DISTINCT) semantics). The DuckDB twin is
    * `('0x' || substr(md5(rendered), 1, 15))::BIGINT`.
    */
  def hash60(rendered: Column): Column =
    org.apache.spark.sql.GraftBridge.column(Md5Prefix60(
      org.apache.spark.sql.GraftBridge.expression(rendered.cast(StringType))))
}
