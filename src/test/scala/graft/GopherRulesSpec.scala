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

  test("preference_pairs: crafted groups pin scores, tiebreaks, and both gates") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("prefpairs").toString
    // scores are 200·stop_hits + n_chars − 4·punct_chars (exact integers):
    //   s1: 611 / 7 / 3        -> kept, margin 608
    //   s2: 7 / 5              -> DROPPED by the margin gate (2 < 50)
    //   s3: singleton          -> DROPPED by the group-size gate
    //   s4: 206 / 206 / 2      -> chosen TIE -> lowest doc_id (7)
    //   s5: 206 / 2 / 2        -> rejected TIE -> lowest doc_id (10)
    //   s6: 611 / −8           -> punct term drives rejected_score negative
    val docs = Seq(
      (1L, "the data of", "en", "s1"),
      (2L, "zzz qqq", "en", "s1"),
      (3L, "mmm", "en", "s1"),
      (4L, "aaa bbb", "en", "s2"),
      (5L, "cc dd", "en", "s2"),
      (6L, "solo doc", "en", "s3"),
      (7L, "the xx", "en", "s4"),
      (8L, "the yy", "en", "s4"),
      (9L, "zz", "en", "s4"),
      (10L, "qq", "en", "s5"),
      (11L, "ww", "en", "s5"),
      (12L, "the aa", "en", "s5"),
      (13L, "a!!!", "en", "s6"),
      (14L, "the the the", "en", "s6"))
    docs.map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextOps.preferencePairs(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id"),
          r.getAs[Long]("chosen_score"), r.getAs[Long]("rejected_score"),
          r.getAs[Long]("margin"), r.getAs[Long]("n_candidates"))).toMap
    assert(got.keySet == Set("s1", "s4", "s5", "s6"),
      s"gates wrong: ${got.keySet}")
    assert(got("s1") == ((1L, 3L, 611L, 3L, 608L, 3L)))
    assert(got("s4") == ((7L, 9L, 206L, 2L, 204L, 3L)))
    assert(got("s5") == ((12L, 10L, 206L, 2L, 204L, 3L)))
    assert(got("s6") == ((14L, 13L, 611L, -8L, 619L, 2L)))
  }

  test("source_winrate: rank-summary u2 equals the brute-force all-pairs definition") {
    val stop = Set("the", "and", "a", "of", "to", "data", "scan")
    val sf = "/root/testdata/sf0.001"
    val rows = graft.model.Tables.documents(spark, sf)
      .select("text", "lang", "source", "n_chars").collect()
      .map { r =>
        val text = r.getAs[String]("text")
        val hits = text.trim.split(" ", -1).count(stop.contains)
        val punct = text.count(c => !(c == ' ' || c.isDigit ||
          (c >= 'a' && c <= 'z')))
        (r.getAs[String]("lang"), r.getAs[String]("source"),
          200L * hits + r.getAs[Long]("n_chars") - 4L * punct)
      }
    // brute force: every doc pair within a language, ties worth 1
    def u2(lang: String, a: String, b: String): Long = {
      val as = rows.filter(r => r._1 == lang && r._2 == a).map(_._3)
      val bs = rows.filter(r => r._1 == lang && r._2 == b).map(_._3)
      (for (x <- as; y <- bs) yield
        if (x > y) 2L else if (x == y) 1L else 0L).sum
    }
    val got = TextOps.sourceWinrate(spark, sf).collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val (lang, a, b) = (r.getAs[String]("lang"),
        r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      assert(a < b, "only the a < b direction is emitted")
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      val uab = u2(lang, a, b)
      assert(r.getAs[Long]("u2") == uab, s"($lang, $a, $b)")
      // the Mann-Whitney identity: wins + losses + ties partition all pairs
      assert(uab + u2(lang, b, a) == 2L * na * nb, s"identity ($lang, $a, $b)")
      assert(r.getAs[Double]("win_rate")
        == uab.toDouble / (2L * na * nb).toDouble)
    }
    // every co-present pair is emitted, none fabricated
    val pairs = rows.map(r => (r._1, r._2)).distinct.groupBy(_._1)
    val expectPairs = pairs.flatMap { case (lang, g) =>
      val ss = g.map(_._2).sorted
      for (i <- ss.indices; j <- i + 1 until ss.size)
        yield (lang, ss(i), ss(j))
    }.toSet
    assert(got.map(r => (r.getAs[String]("lang"), r.getAs[String]("source_a"),
      r.getAs[String]("source_b"))).toSet == expectPairs)
    // the matrix is informative: not every pair sits at 0.5
    assert(got.exists(r => math.abs(r.getAs[Double]("win_rate") - 0.5) > 0.05),
      "all win rates ~0.5 — matrix uninformative, fixture suspicious")
  }

  test("shuffle_audit: adjacency census matches a straight-line replay of the shuffle order") {
    import graft.ops.PipelineOps
    val sf = "/root/testdata/sf0.01"
    val P = 1000000007L
    val rows = graft.model.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    val keyed = rows.map { case (id, src) =>
      val hkey = id % P * 2654435761L % P
      (hkey % 64, hkey, id, src)
    }
    val byShard = keyed.groupBy(_._1).values
    var nPairs = 0L
    var collisions = 0L
    for (shard <- byShard) {
      val ordered = shard.sortBy(t => (t._2, t._3)).map(_._4)
      ordered.sliding(2).foreach {
        case Array(a, b) => nPairs += 1; if (a == b) collisions += 1
        case _ =>
      }
    }
    val ns = rows.groupBy(_._2).map(_._2.length.toLong)
    val n = rows.length.toLong
    val expectedNum = ns.map(x => x * (x - 1)).sum
    val expectedDen = n * (n - 1)
    val got = PipelineOps.shuffleAudit(spark, sf).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getAs[Long]("n_docs") == n)
    assert(r.getAs[Long]("n_pairs") == nPairs)
    assert(r.getAs[Long]("collisions") == collisions)
    assert(r.getAs[Long]("expected_num") == expectedNum)
    assert(r.getAs[Long]("expected_den") == expectedDen)
    assert(r.getAs[Double]("collision_rate") == collisions.toDouble / nPairs)
    assert(r.getAs[Boolean]("well_mixed") ==
      (BigInt(collisions) * expectedDen <= BigInt(2) * nPairs * expectedNum))
    // adjacency pairs exist, and the shuffle passes its own audit. NOTE:
    // collisions are legitimately ZERO here — source = src(doc_id % 20)
    // and the multiplicative hash is a low-discrepancy sequence (the
    // three-distance theorem: sorted-adjacent ids differ by a small fixed
    // set of steps, none ≡ 0 mod 20), i.e. the shuffle is SUB-random on
    // this fixture, which well_mixed correctly reports as mixed
    assert(nPairs > 0, "no adjacency pairs — fixture too small for the audit")
    assert(r.getAs[Boolean]("well_mixed"))
  }

  test("compression_ratio: deflate replay matches; repetition drives the flag") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    def deflatedLen(text: String): Long = {
      val d = new java.util.zip.Deflater()
      val raw = text.getBytes("UTF-8")
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](1 << 16)
      var out = 0L
      while (!d.finished()) out += d.deflate(buf)
      d.end(); out
    }
    val texts = graft.model.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val got = QualityOps.compressionRatio(spark, sf).collect()
    assert(got.length == texts.size)
    for (r <- got) {
      val id = r.getAs[Long]("doc_id")
      val raw = texts(id).getBytes("UTF-8").length.toLong
      val defl = deflatedLen(texts(id))
      assert(r.getAs[Long]("n_raw") == raw, s"doc $id")
      assert(r.getAs[Long]("n_deflate") == defl, s"doc $id")
      assert(r.getAs[Double]("ratio") == defl.toDouble / raw, s"doc $id")
      assert(r.getAs[Boolean]("repetitive") ==
        (defl.toDouble / raw < QualityOps.RepetitiveRatioThreshold), s"doc $id")
    }
    // the gate is real on the fixture: both branches occur
    val flags = got.map(_.getAs[Boolean]("repetitive"))
    assert(flags.contains(true) && flags.contains(false),
      "flag never splits the fixture — threshold vacuous")
    // and the signal points the right way on crafted extremes
    val dir = java.nio.file.Files.createTempDirectory("comprat").toString
    val repetitive = "spam spam " * 40
    // splitmix64-mixed 64-symbol text (~6 bits/char, ratio ≈ 0.84):
    // genuinely incompressible — a bare multiplicative map is an
    // ARITHMETIC progression mod p and zlib models it (measured 0.43)
    val alphabet = (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++ Seq(' ', '.')).mkString
    def mix(i: Long): Int = {
      var x = i * 0x9E3779B97F4A7C15L
      x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
      x ^= x >>> 27; x *= 0x94D049BB133111EBL
      x ^= x >>> 31
      (x & 63L).toInt
    }
    val varied = (0 until 400).map(i => alphabet(mix(i.toLong))).mkString("")
    Seq((1L, repetitive, "en", "s", repetitive.length.toLong),
      (2L, varied, "en", "s", varied.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val crafted = QualityOps.compressionRatio(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("repetitive")).toMap
    assert(crafted(1L), "degenerate repetition not flagged")
    assert(!crafted(2L), "high-entropy text flagged")
  }

  test("shuffle_audit: an order-correlated corpus trips the well_mixed alert") {
    import spark.implicits._
    import graft.ops.PipelineOps
    val P = 1000000007L
    val dir = java.nio.file.Files.createTempDirectory("shuffleaudit").toString
    // adversarial fixture: assign sources in RUNS of the HASH order, so
    // shard-adjacent documents almost always share a source — the
    // monotone-ingest pathology the audit exists to catch
    val ids = (0L until 400L).toSeq
    val byHash = ids.sortBy(id => (id % P * 2654435761L % P % 64,
      id % P * 2654435761L % P, id))
    // 8 runs of 50: expected collision rate ≈ 8·(50·49)/(400·399) ≈ 0.12,
    // while run-adjacency drives the observed rate near 1 — far past 2×
    val srcOf = byHash.zipWithIndex
      .map { case (id, rank) => id -> s"run${rank / 50}" }.toMap
    ids.map(id => (id, "x y z", "en", srcOf(id), 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = PipelineOps.shuffleAudit(spark, dir).collect()(0)
    assert(!r.getAs[Boolean]("well_mixed"),
      s"run-structured corpus passed the audit: $r")
    assert(r.getAs[Double]("collision_rate")
      > 2 * r.getAs[Double]("expected_rate"))
  }

  test("preference_pairs: fixture rows match a straight-line replay") {
    val stop = Set("the", "and", "a", "of", "to", "data", "scan")
    val sf = "/root/testdata/sf0.001"
    val rows = graft.model.Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[String]("lang"), r.getAs[String]("source"),
        r.getAs[Long]("n_chars")))
    def score(text: String, nChars: Long): Long = {
      val hits = text.trim.split(" ", -1).count(stop.contains)
      val punct = text.count(c => !(c == ' ' || c.isDigit ||
        (c >= 'a' && c <= 'z')))
      200L * hits + nChars - 4L * punct
    }
    val expect = rows.groupBy(r => (r._3, r._4)).flatMap { case (k, g) =>
      val scored = g.map(r => (r._1, score(r._2, r._5)))
      val chosen = scored.minBy { case (id, s) => (-s, id) }
      val rejected = scored.minBy { case (id, s) => (s, id) }
      val margin = chosen._2 - rejected._2
      if (g.length >= 2 && margin >= TextOps.PrefMinMargin)
        Some(k -> (chosen._1, rejected._1, margin, g.length.toLong))
      else None
    }
    val got = TextOps.preferencePairs(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        (r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id"),
          r.getAs[Long]("margin"), r.getAs[Long]("n_candidates"))).toMap
    assert(got.nonEmpty, "no pairs mined from the fixture — vacuous")
    assert(got == expect)
  }
}
