package graft

import graft.ops.SimilarityOps

/** Ground truth for the RRF hybrid-retrieval fusion: the lexical leg and
  * the fusion arithmetic are recomputed single-threaded in plain Scala
  * (3-gram sets, overlap ranks, 1/(60+rank) sums), the vector leg's ranks
  * are taken from knn_cosine's own output (itself oracle- and
  * spec-pinned), and the composed expectation must match the op row for
  * row.
  */
class HybridRrfSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("fused ranking matches a driver-side RRF replay at sf0.001") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(t: String): Set[String] = {
      val w = t.trim.split(" ", -1)
      if (w.length < 3) Set.empty
      else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val gs = docs.map { case (id, t) => id -> grams(t) }
    val queries = docs.keys.filter(_ < 10).toSeq.sorted

    // lexical leg: distinct-3-gram overlap, (overlap desc, id) top-10,
    // zero overlaps never rank
    val lleg: Map[(Long, Long), Int] = queries.flatMap { q =>
      val qg = gs(q)
      gs.toSeq
        .filter { case (id, g) => id != q && g.intersect(qg).nonEmpty }
        .map { case (id, g) => (id, g.intersect(qg).size) }
        .sortBy { case (id, ov) => (-ov, id) }
        .take(10).zipWithIndex
        .map { case ((id, _), i) => (q, id) -> (i + 1) }
    }.toMap
    assert(lleg.nonEmpty, "no lexical overlaps at sf0.001 — lexical leg vacuous")

    // vector leg: knn_cosine's own (pinned) ranks
    val vleg: Map[(Long, Long), Int] =
      SparkEntry.queries("knn_cosine")(spark, sf).collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")) ->
          r.getAs[Int]("rk")).toMap

    val expected = queries.flatMap { q =>
      val ids = (lleg.keySet ++ vleg.keySet).collect { case (`q`, id) => id }
      ids.map { id =>
        val rv = vleg.get((q, id))
        val rl = lleg.get((q, id))
        val fused = rv.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          rl.map(r => 1.0 / (60 + r)).getOrElse(0.0)
        (q, id, rv.getOrElse(0), rl.getOrElse(0), fused)
      }.toSeq.sortBy { case (_, id, _, _, f) => (-f, id) }
        .take(10).zipWithIndex
        .map { case ((qq, id, rv, rl, f), i) => (qq, id) -> (rv, rl, f, i + 1) }
    }.toMap

    val got = SimilarityOps.hybridRrf(spark, sf).collect().map { r =>
      (r.getAs[Long]("q_id"), r.getAs[Long]("id")) -> (
        r.getAs[Int]("rk_v"), r.getAs[Int]("rk_l"),
        r.getAs[Double]("fused"), r.getAs[Int]("fused_rk"))
    }.toMap

    assert(got.keySet == expected.keySet,
      s"only-got=${got.keySet -- expected.keySet} only-exp=${expected.keySet -- got.keySet}")
    for ((k, e) <- expected) assert(got(k) == e, s"pair $k")
    // fusion is genuinely hybrid on this fixture: some fused top-10 row
    // must come from each leg alone, and some from both
    val rows = got.values.toSeq
    assert(rows.exists(r => r._1 > 0 && r._2 == 0), "no vector-only row")
    assert(rows.exists(r => r._1 == 0 && r._2 > 0), "no lexical-only row")
  }

  test("ndcg_eval matches a driver-side integer-DCG replay at sf0.001") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(t: String): Set[String] = {
      val w = t.trim.split(" ", -1)
      if (w.length < 3) Set.empty
      else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val gs = docs.map { case (id, t) => id -> grams(t) }
    val queries = docs.keys.filter(_ < 10).toSeq.sorted
    // lexical ranking (the system under test), replayed as in the RRF spec
    val lleg: Map[Long, Seq[(Long, Int)]] = queries.map { q =>
      val qg = gs(q)
      q -> gs.toSeq
        .filter { case (id, g) => id != q && g.intersect(qg).nonEmpty }
        .map { case (id, g) => (id, g.intersect(qg).size) }
        .sortBy { case (id, ov) => (-ov, id) }
        .take(10).zipWithIndex
        .map { case ((id, _), i) => (id, i + 1) }
    }.toMap
    // relevance: knn_cosine's own (pinned) ranks, graded gain 11-rk
    val gains: Map[(Long, Long), Long] =
      SparkEntry.queries("knn_cosine")(spark, sf).collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")) ->
          (11L - r.getAs[Int]("rk"))).toMap
    val disc = SimilarityOps.NdcgDiscounts
    val got = SimilarityOps.ndcgEval(spark, sf).collect()
      .map(r => r.getAs[Long]("q_id") -> r).toMap
    assert(got.keySet == queries.toSet, "every query must report a row")
    for (q <- queries) {
      val ranked = lleg(q)
      val hits = ranked.filter { case (id, _) => gains.contains((q, id)) }
      val dcg = ranked.map { case (id, rk) =>
        gains.getOrElse((q, id), 0L) * disc(rk - 1)
      }.sum
      val row = got(q)
      assert(row.getAs[Long]("n_hits") == hits.length.toLong, s"q=$q")
      assert(row.getAs[Int]("best_hit_rank") ==
        hits.headOption.map(_._2).getOrElse(0), s"q=$q")
      assert(row.getAs[Long]("dcg_scaled") == dcg, s"q=$q")
      assert(row.getAs[Double]("ndcg") ==
        dcg.toDouble / SimilarityOps.NdcgIdealScaled.toDouble, s"q=$q")
    }
    // the metric must be non-degenerate on the fixture: some query finds
    // relevant docs lexically, some lexical rows are non-relevant
    assert(got.values.exists(_.getAs[Long]("n_hits") > 0L), "no hits — eval vacuous")
    assert(got.values.exists(r =>
      r.getAs[Long]("n_hits") < lleg(r.getAs[Long]("q_id")).length),
      "every lexical row relevant — miss path vacuous")
  }

  test("hard_negatives matches a driver-side cosine replay at sf0.001") {
    val rows = spark.read.parquet(s"$sf/embeddings.parquet").collect().map { r =>
      (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
    }
    def nrm(v: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val anchors = rows.filter(_._1 < 10)
    val expected = anchors.flatMap { case (qId, qLabel, qv) =>
      val qn = nrm(qv)
      val scored = rows.filter(_._1 != qId).map { case (id, lb, v) =>
        (id, lb, dot(v, qv) / (nrm(v) * qn))
      }
      val posCos = scored.filter(_._2 == qLabel).map(_._3).max
      scored.filter(_._2 != qLabel)
        .sortBy { case (id, _, c) => (-c, id) }
        .take(5).zipWithIndex.map { case ((id, lb, c), i) =>
          (qId, id) -> (qLabel, lb, c, i + 1, posCos, posCos - c)
        }
    }.toMap
    val got = SimilarityOps.hardNegatives(spark, sf).collect().map { r =>
      (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")) -> (
        r.getAs[Int]("q_label"), r.getAs[Int]("label"),
        r.getAs[Double]("cosine"), r.getAs[Int]("rk"),
        r.getAs[Double]("pos_cos"), r.getAs[Double]("margin"))
    }.toMap
    assert(got.keySet == expected.keySet,
      s"only-got=${got.keySet -- expected.keySet} only-exp=${expected.keySet -- got.keySet}")
    for ((k, e) <- expected) assert(got(k) == e, s"pair $k")
    assert(got.size == anchors.length * 5, "every anchor must mine 5 negatives")
    // the mining must surface genuinely hard negatives somewhere: a
    // negative that beats the anchor's best positive (margin < 0)
    assert(got.values.exists(_._6 < 0.0),
      "no margin-violating negative on the fixture — hardness vacuous")
  }

  test("bm25_topk matches a driver-side BM25 replay at sf0.001") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def gramList(t: String): Seq[String] = {
      val w = t.trim.split(" ", -1)
      if (w.length < 3) Seq.empty
      else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}")
    }
    val byDoc = docs.map { case (id, t) => id -> gramList(t) }
      .filter(_._2.nonEmpty)
    val dl = byDoc.map { case (id, g) => id -> g.length.toLong }
    val nDocs = byDoc.size.toLong
    val tGrams = dl.values.sum
    val queries = byDoc.keys.filter(_ < 10).toSeq.sorted
    val qGramSet = queries.flatMap(q => byDoc(q)).toSet
    // tf per (doc, gram) over query-relevant grams; df corpus-wide
    val tf: Map[(Long, String), Long] = byDoc.toSeq.flatMap { case (id, gs) =>
      gs.filter(qGramSet).groupBy(identity).map { case (g, o) =>
        (id, g) -> o.length.toLong
      }
    }.toMap
    val df: Map[String, Long] = tf.keys.toSeq.groupBy(_._2)
      .map { case (g, ks) => g -> ks.length.toLong }
    val idfQ6: Map[String, Long] = df.map { case (g, d) =>
      g -> math.floor(math.log(1.0 +
        (nDocs.toDouble - d.toDouble + 0.5) / (d.toDouble + 0.5)) * 1e6).toLong
    }
    val expected: Map[(Long, Long), (Long, Int)] = queries.flatMap { q =>
      val qGrams = byDoc(q).toSet
      val scored = byDoc.keys.filter(_ != q).toSeq.map { d =>
        val s = qGrams.toSeq.flatMap { g =>
          tf.get((d, g)).map { t =>
            val tfn = (t.toDouble * 2.2) /
              (t.toDouble + 1.2 * (0.25 + 0.75 *
                ((dl(d) * nDocs).toDouble / tGrams.toDouble)))
            math.floor(idfQ6(g).toDouble * tfn).toLong
          }
        }.sum
        (d, s)
      }.filter(_._2 != 0L || qGrams.nonEmpty) // candidates share ≥1 gram
      scored.filter { case (d, _) => byDoc(d).exists(qGrams) }
        .sortBy { case (d, s) => (-s, d) }
        .take(10).zipWithIndex.map { case ((d, s), i) => (q, d) -> (s, i + 1) }
    }.toMap
    val got = SimilarityOps.bm25TopK(spark, sf).collect().map { r =>
      (r.getAs[Long]("q_id"), r.getAs[Long]("id")) ->
        (r.getAs[Long]("score_q6"), r.getAs[Int]("rk"),
          r.getAs[Double]("score"))
    }.toMap
    assert(got.keySet == expected.keySet,
      s"only-got=${got.keySet -- expected.keySet} only-exp=${expected.keySet -- got.keySet}")
    for ((k, (s, rk)) <- expected) {
      assert(got(k)._1 == s, s"score_q6 at $k")
      assert(got(k)._2 == rk, s"rk at $k")
      assert(got(k)._3 == s.toDouble / 1e6, s"score at $k")
    }
    // Non-vacuity: idf weighting must actually change a ranking — some
    // query's BM25 top-10 ordering must differ from the raw distinct-
    // overlap ordering lexicalTopK produces. (tf saturation can't be
    // exercised through the corpus: repeated trigrams exist in documents
    // — 36 at sf0.001 — but none is query-relevant in a candidate doc at
    // any SF, so every ranked tf is 1; the tfn formula itself is pinned
    // by the replay above.)
    val overlapOrder: Map[Long, Seq[Long]] = queries.map { q =>
      val qs = byDoc(q).toSet
      q -> byDoc.keys.filter(_ != q).toSeq
        .map(d => (d, byDoc(d).toSet.intersect(qs).size))
        .filter(_._2 > 0)
        .sortBy { case (d, o) => (-o, d) }.take(10).map(_._1)
    }.toMap
    val bm25Order: Map[Long, Seq[Long]] = expected.toSeq
      .groupBy(_._1._1)
      .map { case (q, rows) => q -> rows.sortBy(_._2._2).map(_._1._2) }
    assert(queries.exists(q => bm25Order(q) != overlapOrder(q)),
      "BM25 order identical to raw overlap for every query — weighting vacuous")
  }

  test("hybrid_rrf3 matches a driver-side three-leg fusion replay at sf0.001") {
    // the three legs from the ops' OWN outputs (each leg is pinned by
    // its own replay test above / in knn_cosine's oracle); this test
    // pins the three-way fusion arithmetic and top-10 cut
    val vleg: Map[(Long, Long), Int] =
      SparkEntry.queries("knn_cosine")(spark, sf).collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")) ->
          r.getAs[Int]("rk")).toMap
    val bleg: Map[(Long, Long), Int] =
      SimilarityOps.bm25TopK(spark, sf).collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("id")) ->
          r.getAs[Int]("rk")).toMap
    // the full lexical leg is recomputed here (hybridRrf's output only
    // carries lexical ranks that survived ITS two-leg fused top-10)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(t: String): Set[String] = {
      val w = t.trim.split(" ", -1)
      if (w.length < 3) Set.empty
      else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val gs = docs.map { case (id, t) => id -> grams(t) }
    val queries = docs.keys.filter(_ < 10).toSeq.sorted
    val llegFull: Map[(Long, Long), Int] = queries.flatMap { q =>
      val qg = gs(q)
      gs.toSeq
        .filter { case (id, g) => id != q && g.intersect(qg).nonEmpty }
        .map { case (id, g) => (id, g.intersect(qg).size) }
        .sortBy { case (id, ov) => (-ov, id) }
        .take(10).zipWithIndex
        .map { case ((id, _), i) => (q, id) -> (i + 1) }
    }.toMap
    val expected = queries.flatMap { q =>
      val ids = (vleg.keySet ++ llegFull.keySet ++ bleg.keySet)
        .collect { case (`q`, id) => id }
      ids.map { id =>
        val rv = vleg.get((q, id)); val rl = llegFull.get((q, id))
        val rb = bleg.get((q, id))
        val fused = rv.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          rl.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          rb.map(r => 1.0 / (60 + r)).getOrElse(0.0)
        (q, id, rv.getOrElse(0), rl.getOrElse(0), rb.getOrElse(0), fused)
      }.toSeq.sortBy { case (_, id, _, _, _, f) => (-f, id) }
        .take(10).zipWithIndex
        .map { case ((qq, id, rv, rl, rb, f), i) =>
          (qq, id) -> (rv, rl, rb, f, i + 1) }
    }.toMap
    val got = SimilarityOps.hybridRrf3(spark, sf).collect().map { r =>
      (r.getAs[Long]("q_id"), r.getAs[Long]("id")) -> (
        r.getAs[Int]("rk_v"), r.getAs[Int]("rk_l"), r.getAs[Int]("rk_b"),
        r.getAs[Double]("fused"), r.getAs[Int]("fused_rk"))
    }.toMap
    assert(got.keySet == expected.keySet,
      s"only-got=${got.keySet -- expected.keySet} only-exp=${expected.keySet -- got.keySet}")
    for ((k, e) <- expected) assert(got(k) == e, s"pair $k")
    // the third leg must genuinely move the fusion: some row's two
    // lexical ranks disagree, and some fused row carries a bm25 rank
    val rows = got.values.toSeq
    assert(rows.exists(r => r._2 > 0 && r._3 > 0 && r._2 != r._3),
      "overlap and BM25 ranks never disagree — third leg vacuous")
    assert(rows.exists(r => r._3 > 0), "no bm25-ranked row in any top-10")
  }

  test("rbo_eval: suffix-sum algebra equals the per-depth RBO definition") {
    import graft.ops.SimilarityOps
    // ladder sanity: w_d = (2520/d)·2^(10−d) exactly, tails are suffix sums
    for (d <- 1 to 10) {
      assert(2520 % d == 0, s"2520 must clear the /$d")
      assert(SimilarityOps.RboWeights(d - 1) == (2520L / d) << (10 - d))
    }
    assert(SimilarityOps.RboTailWeights.head == SimilarityOps.RboWeights.sum)
    // identical rankings hit the truncated ceiling Σ w_d·d = 2577960
    assert((1 to 10).map(d => SimilarityOps.RboWeights(d - 1) * d).sum
      == 2577960L)
    val aLeg = SimilarityOps.knnCosine(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
        r.getAs[Int]("rk")))
    val bLeg = SimilarityOps.bm25TopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("id"),
        r.getAs[Int]("rk")))
    // brute force BY DEFINITION: per depth d, count |top_a(d) ∩ top_b(d)|
    // and weight it w_d — independent of the engine's per-id suffix trick
    def rboScaled(q: Long): (Long, Long) = {
      val as = aLeg.filter(_._1 == q)
      val bs = bLeg.filter(_._1 == q)
      val scaled = (1 to 10).map { d =>
        val ta = as.filter(_._3 <= d).map(_._2).toSet
        val tb = bs.filter(_._3 <= d).map(_._2).toSet
        SimilarityOps.RboWeights(d - 1) * ta.intersect(tb).size
      }.sum
      val shared = as.map(_._2).toSet.intersect(bs.map(_._2).toSet).size
      (scaled, shared.toLong)
    }
    val got = SimilarityOps.rboEval(spark, sf).collect()
      .map(r => r.getAs[Long]("q_id") -> r).toMap
    val qids = (aLeg.map(_._1) ++ bLeg.map(_._1)).distinct
    assert(got.keySet == qids.toSet, "one row per query, none dropped")
    for (q <- qids) {
      val (scaled, shared) = rboScaled(q)
      val r = got(q)
      assert(r.getAs[Long]("rbo_scaled") == scaled, s"q $q")
      assert(r.getAs[Long]("n_shared") == shared, s"q $q")
      assert(r.getAs[Double]("rbo")
        == scaled.toDouble / SimilarityOps.RboDenom.toDouble, s"q $q")
      assert(r.getAs[Double]("rbo") >= 0.0 &&
        r.getAs[Double]("rbo") <= 2577960.0 / SimilarityOps.RboDenom)
    }
    // the metric is informative on the fixture: the two retrievers neither
    // coincide (rbo at ceiling) nor are disjoint everywhere (all zero)
    assert(got.values.exists(_.getAs[Long]("n_shared") > 0),
      "no query shares any id across retrievers — rbo vacuous")
    assert(got.values.exists(r => r.getAs[Long]("rbo_scaled") < 2577960L),
      "every query at the ceiling — retrievers identical, rbo vacuous")
  }
}
