package graft

/** The FAISS residual-encoding experiment (round-6 verdict item): does
  * encoding u − centroid[cell] (true IVFPQ form) instead of u lift
  * ann_ivfpq recall@3 past the probe ceiling? Driver-side deterministic
  * replica of the engine's index math (same M/K/probe constants, same
  * fixed-start Lloyd) over the sf0.001 corpus — recall is a property of
  * the ALGORITHM, measured here once and committed with the numbers.
  *
  * MEASURED NEGATIVE RESULT (2026-08-13, deterministic — fixed-start
  * Lloyd, vec_id-sorted corpus, no RNG):
  *
  *   recall@3, probe  8/16:  plain 0.800   residual 0.733
  *   recall@3, probe 16/16:  plain 0.933   residual 0.833
  *
  * Residual encoding does NOT clear the 0.85 bar at probe 8 — it LOSES to
  * plain-u encoding at every probe width on this corpus, including full
  * probe where the IVF ceiling is out of the picture entirely. Why: the
  * fixture embeddings are near-isotropic random vectors, so the 16 coarse
  * cells explain almost none of the variance — residuals have nearly the
  * magnitude of the originals but with the coarse structure SUBTRACTED,
  * and a codebook shared across all cells then quantizes a mixture of 16
  * shifted distributions strictly worse than it quantizes u itself.
  * Residual encoding pays off exactly when cells are tight (clustered
  * real-world embeddings, nList ~ √N); on this corpus the binding
  * constraint stays the probe fraction, confirming the IvfPqProbe
  * Scaladoc's analysis. The engine therefore keeps plain-u encoding.
  */
class ResidualPqExperiment extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private val NList = 16
  private val M = 8
  private val SubDim = 8
  private val K = 32
  private val Cand = 64

  private def lloyd(points: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    val d = points.head.length
    var centers = Array.tabulate(k)(c => points(c * points.length / k).clone())
    (0 until iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Long](k)
      points.foreach { p =>
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < k) {
          var s = 0.0; var j = 0
          val ctr = centers(c)
          while (j < d) { val t = p(j) - ctr(j); s += t * t; j += 1 }
          if (s < bestD) { bestD = s; best = c }
          c += 1
        }
        var j = 0
        while (j < d) { sums(best)(j) += p(j); j += 1 }
        counts(best) += 1
      }
      centers = Array.tabulate(k)(c =>
        if (counts(c) == 0) centers(c) else sums(c).map(_ / counts(c)))
    }
    centers
  }

  private def l2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var j = 0
    while (j < a.length) { val t = a(j) - b(j); s += t * t; j += 1 }
    s
  }

  private def argminCell(u: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cents.length) {
      val d = l2(u, cents(c)); if (d < bestD) { bestD = d; best = c }; c += 1
    }
    best
  }

  private def trainPq(train: Array[Array[Double]]): Array[Array[Array[Double]]] =
    Array.tabulate(M)(j => lloyd(train.map(_.slice(j * SubDim, (j + 1) * SubDim)), K, 10))

  private def encode(u: Array[Double], cb: Array[Array[Array[Double]]]): Array[Int] =
    Array.tabulate(M) { j =>
      val sub = u.slice(j * SubDim, (j + 1) * SubDim)
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < K) {
        val d = l2(sub, cb(j)(c)); if (d < bestD) { bestD = d; best = c }; c += 1
      }
      best
    }

  private def adc(codes: Array[Int], dtab: Array[Array[Double]]): Double = {
    var s = 0.0; var j = 0
    while (j < M) { s += dtab(j)(codes(j)); j += 1 }
    s
  }

  private def dtabOf(qr: Array[Double], cb: Array[Array[Array[Double]]]): Array[Array[Double]] =
    Array.tabulate(M) { j =>
      val sub = qr.slice(j * SubDim, (j + 1) * SubDim)
      Array.tabulate(K)(c => l2(sub, cb(j)(c)))
    }

  test("residual encoding vs plain PQ: measured recall@3 at probe 8 and full probe") {
    val rows = graft.model.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    val ids = rows.map(_._1)
    val us = rows.map { case (_, v) =>
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val byId = ids.zip(us).toMap
    // coarse quantizer in u-space (FAISS form: PQ and IVF share one space)
    val cents = lloyd(us, NList, 10)
    val cellOf = us.map(argminCell(_, cents))
    val cellsIdx = (0 until NList).map(c =>
      ids.indices.filter(i => cellOf(i) == c).toArray).toArray
    // plain PQ on u; residual PQ on u − centroid[cell]
    val cbPlain = trainPq(us)
    val resids = ids.indices.map(i =>
      us(i).zip(cents(cellOf(i))).map { case (a, b) => a - b }).toArray
    val cbRes = trainPq(resids)
    val codesPlain = us.map(encode(_, cbPlain))
    val codesRes = resids.map(encode(_, cbRes))

    val queries = ids.indices.filter(i => ids(i) < 10)
    val exactTop3: Map[Int, Set[Long]] = queries.map { qi =>
      val uq = us(qi)
      qi -> ids.indices.filter(_ != qi)
        .map(i => (us(i).zip(uq).map { case (a, b) => a * b }.sum, ids(i)))
        .sortBy { case (cos, id) => (-cos, id) }
        .take(3).map(_._2).toSet
    }.toMap
    def rerank(qi: Int, cand: Seq[Int]): Set[Long] = {
      val uq = us(qi)
      cand.map(i => (us(i).zip(uq).map { case (a, b) => a * b }.sum, ids(i)))
        .sortBy { case (cos, id) => (-cos, id) }
        .take(3).map(_._2).toSet
    }
    def recall(f: Int => Set[Long]): Double =
      queries.map(qi => f(qi).intersect(exactTop3(qi)).size / 3.0).sum / queries.size

    def run(nProbe: Int, residual: Boolean): Double = recall { qi =>
      val uq = us(qi)
      val probed = (0 until NList).sortBy(c => l2(uq, cents(c))).take(nProbe)
      // plain mode: ONE query-global lookup table; residual mode is the
      // per-cell table by construction (the query residual depends on c)
      lazy val dtabPlain = dtabOf(uq, cbPlain)
      val cand = probed.flatMap { c =>
        val dtab =
          if (residual) dtabOf(uq.zip(cents(c)).map { case (a, b) => a - b }, cbRes)
          else dtabPlain
        cellsIdx(c).filter(_ != qi).map { i =>
          (adc(if (residual) codesRes(i) else codesPlain(i), dtab), i)
        }
      }.sortBy { case (d, i) => (d, ids(i)) }.take(Cand).map(_._2)
      rerank(qi, cand)
    }

    val plain8 = run(8, residual = false)
    val res8 = run(8, residual = true)
    val plainFull = run(NList, residual = false)
    val resFull = run(NList, residual = true)
    info(f"probe 8/16:  plain=$plain8%.3f residual=$res8%.3f")
    info(f"probe 16/16: plain=$plainFull%.3f residual=$resFull%.3f")
    // the committed negative result: residual encoding does not reach the
    // 0.85 implementation bar at probe 8, and does not beat plain-u
    // encoding at ANY probe width on this corpus (see Scaladoc)
    assert(res8 < 0.85, f"residual probe-8 recall $res8%.3f — revisit: bar cleared")
    assert(plain8 >= res8, f"residual ($res8%.3f) beat plain ($plain8%.3f) at probe 8")
    assert(plainFull >= resFull,
      f"residual ($resFull%.3f) beat plain ($plainFull%.3f) at full probe")
  }
}
