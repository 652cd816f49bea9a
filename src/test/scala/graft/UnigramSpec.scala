package graft

import graft.ops.UnigramOps

/** Ground truth for the unigram-LM tokenizer pair: hand-computed DP cases
  * for the fixed-inventory segmenter, a brute-force corpus replay of
  * `unigram_segment`, and a single-threaded independent EM replay pinning
  * every row of `unigram_train` (the BpeSpec discipline — the trainer is
  * rows-only in the registry, so THIS is its correctness gate).
  */
class UnigramSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private val pieceMap = UnigramOps.Pieces.map(p => p -> UnigramOps.pieceScore(p)).toMap

  test("segmentDp hand-checked cases") {
    // "the" is a piece: one 3-len piece (900) beats th+e (400+10) and t+he (10+400)
    assert(UnigramOps.segmentDp("the", pieceMap) == (900L, 1))
    // "batch": no 5-len pieces; best is b(10 unk) + atch(1600)
    assert(UnigramOps.segmentDp("batch", pieceMap) == (1610L, 2))
    // all-unknown word: one unk char each
    assert(UnigramOps.segmentDp("zzz", pieceMap) == (30L, 3))
    // "there": ther is not a piece; the(900)+re(400) = 1300 in 2 pieces
    // vs th(400)+er(400)+e(10)=810 — check against exhaustive enumeration below
    val (s, n) = UnigramOps.segmentDp("there", pieceMap)
    assert((s, n) == bruteDp("there"))
    assert(s == 1300L && n == 2)
  }

  /** Exhaustive enumeration over ALL segmentations (words are short) —
    * maximally independent of the DP under test.
    */
  private def bruteDp(w: String): (Long, Int) = {
    def segs(s: String): Seq[Seq[String]] =
      if (s.isEmpty) Seq(Nil)
      else (1 to math.min(UnigramOps.MaxPieceLen, s.length)).flatMap { j =>
        val head = s.take(j)
        val ok = pieceMap.contains(head) || j == 1
        if (!ok) Nil else segs(s.drop(j)).map(head +: _)
      }
    def score(seg: Seq[String]): Long =
      seg.map(p => pieceMap.getOrElse(p, UnigramOps.UnkCharScore).toLong).sum
    val all = segs(w)
    val best = all.map(score).max
    (best, all.filter(score(_) == best).map(_.size).min)
  }

  test("segmentDp equals exhaustive enumeration on every corpus word") {
    val words = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("explode(split(lower(text), ' ')) AS w")
      .where("length(w) > 0").distinct().collect().map(_.getString(0))
    assert(words.nonEmpty)
    words.foreach { w =>
      assert(UnigramOps.segmentDp(w, pieceMap) == bruteDp(w), s"word '$w'")
    }
  }

  test("unigram_segment matches a driver-side corpus replay at sf0.001") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val words = docs.flatMap { case (src, text) =>
      text.toLowerCase.split(" ", -1).filter(_.nonEmpty).map(w => (src, w))
    }
    val expected = words.groupBy(_._1).map { case (src, ws) =>
      val dps = ws.map { case (_, w) => (w.length.toLong, UnigramOps.segmentDp(w, pieceMap)) }
      src -> (ws.length.toLong, dps.map(_._1).sum,
        dps.map(_._2._2.toLong).sum, dps.map(_._2._1).sum)
    }
    val got = SparkEntry.queries("unigram_segment")(spark, sf).collect().map { r =>
      r.getAs[String]("source") -> (
        r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("n_pieces"), r.getAs[Long]("score_total"))
    }.toMap
    assert(got.keySet == expected.keySet)
    for ((s, e) <- expected) assert(got(s) == e, s"source $s")
    // both DP branches must fire or the op is vacuous on this corpus
    val docsWords = words.map(_._2).distinct
    assert(docsWords.exists(w => UnigramOps.segmentDp(w, pieceMap)._1 % 100 != 0),
      "no unknown-char fallback exercised")
    assert(docsWords.exists(w => UnigramOps.segmentDp(w, pieceMap)._1 >= 400),
      "no multi-char piece exercised")
  }

  test("unigram_doc_ppl matches a driver-side per-doc replay; the gate splits") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, text) =>
      val ws = text.toLowerCase.split(" ", -1).filter(_.nonEmpty)
      val dps = ws.map(w => UnigramOps.segmentDp(w, pieceMap))
      val score = dps.map(_._1).sum
      val np = dps.map(_._2.toLong).sum
      val avg = score.toDouble / np
      id -> (ws.length.toLong, np, score, avg,
        if (avg >= UnigramOps.MinAvgPieceScore) 1 else 0)
    }.toMap
    val got = SparkEntry.queries("unigram_doc_ppl")(spark, sf).collect().map { r =>
      r.getAs[Long]("doc_id") -> (
        r.getAs[Long]("n_words"), r.getAs[Long]("n_pieces"),
        r.getAs[Long]("score_total"), r.getAs[Double]("avg_piece_score"),
        r.getAs[Int]("keep"))
    }.toMap
    assert(got.keySet == expected.keySet)
    for ((id, e) <- expected) assert(got(id) == e, s"doc $id")
    // the LM gate must fire in both directions on the real corpus
    val keeps = got.values.map(_._5).toSeq
    assert(keeps.contains(1) && keeps.contains(0),
      s"keep is one-sided: ${keeps.count(_ == 1)}/${keeps.size}")
  }

  test("wordpieceWalk hand-checked cases (greedy, not optimal)") {
    // greedy from the left: 'ba'+'t'+'c'+'h' (4 pieces, 3 unknown) even
    // though the DP finds b+atch in 2 — the documented greedy contrast
    assert(UnigramOps.wordpieceWalk("batch", pieceMap) == (4, 3))
    assert(UnigramOps.wordpieceWalk("the", pieceMap) == (1, 0))
    assert(UnigramOps.wordpieceWalk("zzz", pieceMap) == (3, 3))
    // longest match wins at each step: 'tion' consumed whole
    assert(UnigramOps.wordpieceWalk("tion", pieceMap) == (1, 0))
  }

  test("wordpiece_segment matches a driver-side greedy replay at sf0.001") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val words = docs.flatMap { case (src, text) =>
      text.toLowerCase.split(" ", -1).filter(_.nonEmpty).map(w => (src, w))
    }
    val expected = words.groupBy(_._1).map { case (src, ws) =>
      val walks = ws.map { case (_, w) => UnigramOps.wordpieceWalk(w, pieceMap) }
      src -> (ws.length.toLong, walks.map(_._1.toLong).sum, walks.map(_._2.toLong).sum)
    }
    val got = SparkEntry.queries("wordpiece_segment")(spark, sf).collect().map { r =>
      r.getAs[String]("source") -> (
        r.getAs[Long]("n_words"), r.getAs[Long]("n_pieces"), r.getAs[Long]("n_unknown"))
    }.toMap
    assert(got.keySet == expected.keySet)
    for ((s, e) <- expected) assert(got(s) == e, s"source $s")
    // greedy is never better than the DP — pin the contrast corpus-wide
    val dpPieces = words.map { case (_, w) => UnigramOps.segmentDp(w, pieceMap)._2.toLong }.sum
    assert(got.values.map(_._2).sum >= dpPieces)
  }

  /** Independent single-threaded EM replay: same seed rule, same Viterbi
    * tie-breaks, straight-line Scala over the collected word-frequency
    * table.
    */
  test("unigram_train matches a single-threaded EM replay at sf0.001") {
    val wordFreq = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("explode(split(lower(text), ' ')) AS w")
      .where("length(w) > 0")
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // seed: all substrings length 1..4, freq-weighted occurrence counts
    val subCounts = scala.collection.mutable.Map[String, Long]()
    for ((w, n) <- wordFreq; l <- 1 to UnigramOps.MaxPieceLen;
         i <- 0 to w.length - l)
      subCounts(w.substring(i, i + l)) = subCounts.getOrElse(w.substring(i, i + l), 0L) + n
    val singles = subCounts.filter(_._1.length == 1)
    val multis = subCounts.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(48)
    var counts: Map[String, Long] = (singles ++ multis).toMap
    def mStep(c: Map[String, Long]): Map[String, Double] = {
      val total = c.values.sum.toDouble
      c.flatMap { case (p, n) =>
        if (n > 0) Some(p -> math.log(n / total))
        else if (p.length == 1) Some(p -> math.log(0.5 / total))
        else None
      }
    }
    var model = mStep(counts)
    for (_ <- 1 to 3) {
      val next = scala.collection.mutable.Map[String, Long]()
      counts.keys.foreach(p => next(p) = 0L)
      for ((w, n) <- wordFreq; p <- viterbi(w, model))
        next(p) = next(p) + n
      counts = next.toMap
      model = mStep(counts)
    }
    val expected = model.toSeq
      .map { case (p, lp) =>
        (p, p.length, counts.getOrElse(p, 0L), math.rint(lp * 1e6).toLong)
      }
      .sortBy { case (p, _, c, _) => (-c, p) }
      .zipWithIndex
      .map { case ((p, l, c, q), i) => (i + 1, p, l, c, q) }
    val got = SparkEntry.queries("unigram_train")(spark, sf).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("piece"),
        r.getAs[Int]("piece_len"), r.getAs[Long]("cnt"), r.getAs[Long]("logp_q6")))
      .sortBy(_._1)
    assert(got.toSeq == expected, s"got ${got.take(5).toSeq} expected ${expected.take(5)}")
    // the learned model must actually use multi-char pieces
    assert(got.exists(r => r._3 > 1 && r._4 > 0), "no multi-char piece survived EM")
  }

  /** Spec-local Viterbi with the SAME documented tie-break (first j in
    * ascending order wins ties) — reimplemented, not imported.
    */
  private def viterbi(w: String, logp: Map[String, Double]): Seq[String] = {
    val n = w.length
    val sc = Array.fill(n + 1)(Double.NegativeInfinity)
    val bk = new Array[Int](n + 1)
    sc(0) = 0.0
    for (i <- 1 to n) {
      var bestJ = 1
      var best = Double.NegativeInfinity
      for (j <- 1 to math.min(UnigramOps.MaxPieceLen, i)) {
        logp.get(w.substring(i - j, i)).foreach { lp =>
          if (sc(i - j) + lp > best) { best = sc(i - j) + lp; bestJ = j }
        }
      }
      sc(i) = best; bk(i) = bestJ
    }
    var p = n
    val out = scala.collection.mutable.ArrayBuffer[String]()
    while (p > 0) { out += w.substring(p - bk(p), p); p -= bk(p) }
    out.reverse.toSeq
  }
}
