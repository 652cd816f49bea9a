package graft

import org.apache.spark.sql.functions._

import graft.ops.{QualityOps, TextOps}

/** Hand-computed ground truth for the Gopher-style repetition rules:
  * crafted documents with known n-gram structure, written to a temp
  * documents.parquet so the op runs its real path.
  */
class GopherRulesSpec extends SparkSuite {

  test("signals match hand-computed values on crafted documents") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gopher").toString
    // doc 1: "x y x y x y" — n=6, 2-grams: [x y, y x, x y, y x, x y]
    //   top2 mult = 3 ("x y") -> top2_frac = 3*2/6 = 1.0
    //   3-grams: [x y x, y x y, x y x, y x y] -> 4 total, 2 distinct ->
    //   dup3_frac = 0.5; uniq_frac = 2/6; mean_word_len = 6/6 = 1.0
    // doc 2: "the quick brown fox jumps over a lazy dog" — n=9, all
    //   grams unique: top2_frac = 1*2/9, dup3_frac = 0, uniq 1.0,
    //   stop_hits = 2 (the, a), mean = 33/9
    // doc 3: "one two" — too short for 3-grams: dup3_frac 0 by guard
    Seq(
      (1L, "x y x y x y", "en", "s", 11L),
      (2L, "the quick brown fox jumps over a lazy dog", "en", "s", 41L),
      (3L, "one two", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = QualityOps.gopherRules(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    val d1 = got(1L)
    assert(d1.getAs[Int]("n_words") == 6)
    assert(d1.getAs[Double]("mean_word_len") == 1.0)
    assert(d1.getAs[Double]("top2_frac") == 1.0)
    assert(d1.getAs[Double]("dup3_frac") == 0.5)
    assert(d1.getAs[Double]("uniq_frac") == 2.0 / 6)
    assert(d1.getAs[Int]("stop_hits") == 0)
    assert(d1.getAs[Int]("keep") == 0)

    val d2 = got(2L)
    assert(d2.getAs[Int]("n_words") == 9)
    assert(d2.getAs[Double]("mean_word_len") == 33.0 / 9)
    assert(d2.getAs[Double]("top2_frac") == 2.0 / 9)
    assert(d2.getAs[Double]("dup3_frac") == 0.0)
    assert(d2.getAs[Double]("uniq_frac") == 1.0)
    assert(d2.getAs[Int]("stop_hits") == 2)
    assert(d2.getAs[Int]("keep") == 0) // n_words 9 < MinWords 40

    val d3 = got(3L)
    assert(d3.getAs[Double]("top2_frac") == 2.0 / 2) // one 2-gram, mult 1
    assert(d3.getAs[Double]("dup3_frac") == 0.0) // no 3-grams: guard path
  }

  test("every flag fires in both directions on the real corpus") {
    // the thresholds sit at the fixture's observed medians by design —
    // a one-sided flag would make its gate untested
    val df = QualityOps.gopherRules(spark, "/root/testdata/sf0.001")
    val agg = df.agg(
      sum(when(col("keep") === 1, 1).otherwise(0)),
      sum(when(col("keep") === 0, 1).otherwise(0)),
      sum(when(col("n_words") >= QualityOps.GopherThresholds.MinWords, 1).otherwise(0)),
      sum(when(col("top2_frac") <= QualityOps.GopherThresholds.MaxTop2Frac, 1).otherwise(0)),
      sum(when(col("uniq_frac") >= QualityOps.GopherThresholds.MinUniqFrac, 1).otherwise(0)),
      count(lit(1))).collect()(0)
    val (kept, dropped, n) = (agg.getLong(0), agg.getLong(1), agg.getLong(5))
    assert(kept > 0 && dropped > 0, s"keep is one-sided: $kept/$dropped")
    assert(agg.getLong(2) > 0 && agg.getLong(2) < n, "n_words gate one-sided")
    assert(agg.getLong(3) > 0 && agg.getLong(3) < n, "top2 gate one-sided")
    assert(agg.getLong(4) > 0 && agg.getLong(4) < n, "uniq gate one-sided")
  }

  test("content_filter matches a driver replay; both gate directions fire") {
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val terms = QualityOps.BlockedTerms.toSet
    val expect = docs.map { case (id, t, src) =>
      val w = t.trim.split(" ", -1)
      val hits = w.count(terms)
      id -> (src, hits, w.filter(terms).distinct.length, hits == 0)
    }.toMap
    val got = QualityOps.contentFilter(spark, sf).collect().map { r =>
      r.getAs[Long]("doc_id") -> (r.getAs[String]("source"),
        r.getAs[Int]("n_hits"), r.getAs[Int]("n_terms_hit"),
        r.getAs[Boolean]("keep"))
    }.toMap
    assert(got.keySet == expect.keySet)
    for ((k, e) <- expect) assert(got(k) == e, s"doc $k")
    // whole-token semantics: a doc containing "dedup"/"duplicate" style
    // superstrings must NOT hit (the Scunthorpe check) — replay proves
    // it, and both keep and drop must occur on the fixture
    assert(got.values.exists(!_._4), "no doc dropped — blocklist vacuous")
    assert(got.values.count(_._4) > got.values.count(!_._4),
      "most docs must survive a sane lexicon gate")
  }

  test("bleu_eval matches a clipped-count driver replay at sf0.001") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def toks(t: String): Seq[String] = t.trim.split(" ", -1).toSeq
    def grams(w: Seq[String], n: Int): Seq[String] =
      if (w.length < n) Seq.empty
      else w.sliding(n).map(_.mkString(" ")).toSeq
    def clipped(a: Seq[String], b: Seq[String]): Long = {
      val ta = a.groupBy(identity).map { case (g, o) => g -> o.length }
      val tb = b.groupBy(identity).map { case (g, o) => g -> o.length }
      ta.map { case (g, c) => math.min(c, tb.getOrElse(g, 0)) }.sum.toLong
    }
    val expected = docs.keys.filter(d => docs.contains(d + 1)).map { ref =>
      val wr = toks(docs(ref)); val wc = toks(docs(ref + 1))
      val per = (1 to 4).map { n =>
        val (gr, gc) = (grams(wr, n), grams(wc, n))
        val m = clipped(gr, gc) // clipped against the REFERENCE
        (m, gc.length.toLong,
          if (gc.nonEmpty) Some(m.toDouble / gc.length) else None)
      }
      ref -> (wr.length.toLong, wc.length.toLong,
        wc.length < wr.length, per)
    }.toMap
    val got = TextOps.bleuEval(spark, "/root/testdata/sf0.001")
      .collect().map { r =>
        r.getAs[Long]("ref_id") -> (
          r.getAs[Long]("r_len"), r.getAs[Long]("c_len"),
          r.getAs[Boolean]("bp_applies"),
          (1 to 4).map { n =>
            (r.getAs[Long](s"m$n"), r.getAs[Long](s"c$n"),
              Option(r.getAs[java.lang.Double](s"p$n")).map(_.doubleValue))
          })
      }.toMap
    assert(got.keySet == expected.keySet)
    for ((k, e) <- expected) assert(got(k) == e, s"pair $k")
    // non-vacuity: every order has SOME match somewhere, precisions fall
    // with order (clipping sanity), and both bp branches occur
    for (n <- 1 to 4)
      assert(expected.values.exists(_._4(n - 1)._1 > 0L), s"no $n-gram match anywhere")
    assert(expected.values.exists(_._3) && expected.values.exists(!_._3),
      "brevity penalty never/always applies")
  }

  test("watermark_detect matches an MD5 driver replay; clean corpus behaves like a null") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def green(g: String): Boolean = {
      val h = md.digest(g.getBytes("UTF-8"))
      ((h(0) >> 4) & 0xf) <= 7
    }
    val expected = docs.map { case (id, t) =>
      val w = t.trim.split(" ", -1)
      val g2 = if (w.length < 2) Seq.empty
               else (1 until w.length).map(i => s"${w(i - 1)} ${w(i)}")
      val tN = g2.length.toLong
      val gN = g2.count(green).toLong
      id -> (tN, gN,
        if (tN != 0) Some((2.0 * gN - tN) / math.sqrt(tN.toDouble)) else None)
    }
    val got = QualityOps.watermarkDetect(spark, "/root/testdata/sf0.001")
      .collect().map { r =>
        r.getAs[Long]("doc_id") -> (
          r.getAs[Long]("t_scored"), r.getAs[Long]("g_hits"),
          Option(r.getAs[java.lang.Double]("z")).map(_.doubleValue),
          r.getAs[Boolean]("flagged"))
      }.toMap
    assert(got.keySet == expected.keySet)
    for ((k, (tN, gN, z)) <- expected) {
      assert(got(k)._1 == tN, s"t at $k")
      assert(got(k)._2 == gN, s"g at $k")
      // engine z: (2G−T) cast double / sqrt(T) — same IEEE steps
      z match {
        case Some(_) =>
          val e = (2.0 * gN - tN) / math.sqrt(tN.toDouble)
          assert(got(k)._3.contains(e), s"z at $k")
          assert(got(k)._4 == (e > QualityOps.WatermarkZ), s"flag at $k")
        case None => assert(got(k)._3.isEmpty && !got(k)._4)
      }
    }
    // null behavior on a clean corpus: mean z near 0, both branches occur
    val zs = got.values.flatMap(_._3).toSeq
    assert(zs.nonEmpty)
    val meanZ = zs.sum / zs.length
    assert(math.abs(meanZ) < 0.5, s"mean z $meanZ far from 0 on clean text")
    assert(got.values.exists(_._4) && got.values.exists(!_._4),
      "screening threshold never/always fires — branch vacuous")
  }

  test("rouge_eval matches a clipped-count driver replay at sf0.001") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def toks(t: String): Seq[String] = t.trim.split(" ", -1).toSeq
    def bigrams(w: Seq[String]): Seq[String] =
      if (w.length < 2) Seq.empty
      else w.sliding(2).map(p => s"${p.head} ${p.last}").toSeq
    def clipped(a: Seq[String], b: Seq[String]): Long = {
      val ta = a.groupBy(identity).map { case (g, o) => g -> o.length }
      val tb = b.groupBy(identity).map { case (g, o) => g -> o.length }
      ta.map { case (g, c) => math.min(c, tb.getOrElse(g, 0)) }.sum.toLong
    }
    val expected = docs.keys.filter(d => docs.contains(d + 1)).map { ref =>
      val (wr, wc) = (toks(docs(ref)), toks(docs(ref + 1)))
      val (br, bc) = (bigrams(wr), bigrams(wc))
      val ov1 = clipped(wr, wc); val ov2 = clipped(br, bc)
      ref -> (ov1, wr.length.toLong, wc.length.toLong,
        2.0 * ov1 / (wr.length + wc.length),
        ov2, br.length.toLong, bc.length.toLong,
        if (br.length + bc.length != 0)
          Some(2.0 * ov2 / (br.length + bc.length)) else None)
    }.toMap
    val got = TextOps.rougeEval(spark, "/root/testdata/sf0.001")
      .collect().map { r =>
        r.getAs[Long]("ref_id") -> (
          r.getAs[Long]("ov1"), r.getAs[Long]("n1_ref"),
          r.getAs[Long]("n1_cand"), r.getAs[Double]("rouge1_f"),
          r.getAs[Long]("ov2"), r.getAs[Long]("n2_ref"),
          r.getAs[Long]("n2_cand"),
          Option(r.getAs[java.lang.Double]("rouge2_f")).map(_.doubleValue))
      }.toMap
    assert(got.keySet == expected.keySet)
    for ((k, e) <- expected) assert(got(k) == e, s"pair $k")
    // clipping must matter somewhere: some pair's clipped unigram overlap
    // is strictly below the unclipped (sum-of-min vs naive min-of-sums
    // differ only when a gram repeats) — guards against a set-semantics
    // regression reading as ROUGE
    val anyRepeatPair = docs.keys.filter(d => docs.contains(d + 1)).exists { ref =>
      val wr = toks(docs(ref)); val wc = toks(docs(ref + 1))
      val shared = wr.toSet.intersect(wc.toSet)
      shared.exists(g => wr.count(_ == g) > 1 || wc.count(_ == g) > 1)
    }
    assert(anyRepeatPair, "no repeated shared token in any pair — clipping vacuous")
  }
}
