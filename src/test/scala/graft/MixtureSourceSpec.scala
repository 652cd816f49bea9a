package graft

import graft.ops.PipelineOps

/** Ground-truth replays for the two mixture-planning ops, independent of
  * the DuckDB oracle: [[PipelineOps.mixturePlan]] against a driver-side
  * scaled-integer recompute of the whole plan (weights → desired tokens →
  * capped epochs → per-doc copy counts), and [[PipelineOps.sourceOverlap]]
  * against brute set intersection — both on the real sf0.001 corpus and on
  * hand-planted fixtures where the interesting branches (epoch cap,
  * fractional-epoch hash gate, a known leaked passage) are forced.
  */
class MixtureSourceSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  /** Scala twin of PipelineOps.hashBucket: pmod(pmod(id,p)*A, p) % 100. */
  private def hashBucket(id: Long): Long = {
    val p = 1000000007L
    Math.floorMod(Math.floorMod(Math.floorMod(id, p) * 2654435761L, p), 100L)
  }

  private def sqlSplit(text: String): Array[String] =
    SparkSuite.sqlTrim(text).split(" ", -1)

  /** Driver-side recompute of the full mixture plan over (doc_id, source,
    * text) rows — same integer arithmetic, spelled independently.
    */
  private def replayMixture(docs: Seq[(Long, String, String)])
      : Map[String, (Long, Long, Long, Long, Long, Long, Long)] = {
    val rows = docs.map { case (id, source, text) =>
      val w = "(\\d+)$".r.findFirstMatchIn(source).map(_.group(1).toLong).getOrElse(0L) + 1L
      (id, source, sqlSplit(text).length.toLong, w)
    }
    val perSource = rows.groupBy(_._2).map { case (s, rs) =>
      s -> (rs.size.toLong, rs.map(_._3).sum, rs.map(_._4).min)
    }
    val budget = perSource.values.map(_._2).sum
    val wTotal = perSource.values.map(_._3).sum
    perSource.map { case (s, (nDocs, nTokens, w)) =>
      val desired = budget * w / wTotal
      val epochsQ2 = math.min(400L, 100L * desired / nTokens)
      val fullCopies = epochsQ2 / 100
      val fracPct = epochsQ2 % 100
      val mine = rows.filter(_._2 == s)
      val copies = mine.map { case (id, _, toks, _) =>
        val c = fullCopies + (if (hashBucket(id) < fracPct) 1L else 0L)
        (c, c * toks)
      }
      s -> (nDocs, nTokens, w, desired, epochsQ2,
        copies.map(_._1).sum, copies.map(_._2).sum)
    }
  }

  test("mixture_plan matches the driver-side integer replay at sf0.001") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val expected = replayMixture(docs)
    val got = PipelineOps.mixturePlan(spark, sf).collect().map { r =>
      r.getAs[String]("source") -> (
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("target_w"), r.getAs[Long]("desired_tokens"),
        r.getAs[Long]("epochs_q2"),
        r.getAs[Long]("docs_emitted"), r.getAs[Long]("tokens_emitted"))
    }.toMap
    assert(got.keySet == expected.keySet)
    for ((s, exp) <- expected) assert(got(s) == exp, s"source $s")
    // the fixture must exercise BOTH directions or the test is vacuous
    val eq2 = got.values.map(_._5)
    assert(eq2.exists(_ < 100), "no down-sampled source in fixture")
    assert(eq2.exists(_ > 100), "no up-sampled source in fixture")
  }

  test("mixture_plan caps a tiny high-weight source at 4 epochs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mixcap").toString
    // source 'rare999' (target weight 1000) holds ~1% of tokens: uncapped
    // it would be asked for ~50 epochs; the plan must emit exactly 400
    // hundredths. 'bulk' (weight 1) holds the rest and down-samples hard.
    val docs =
      (0 until 2).map(i => (i.toLong, "ten tokens here " + ("pad " * 7).trim, "rare999")) ++
        (2 until 200).map(i => (i.toLong, "ten tokens here " + ("pad " * 7).trim, "bulk"))
    docs.toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val plan = PipelineOps.mixturePlan(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("epochs_q2"), r.getAs[Long]("docs_emitted"))).toMap
    assert(plan("rare999")._1 == 400L, s"epoch cap must bind: $plan")
    assert(plan("rare999")._2 == 8L, "4 full epochs of 2 docs")
    assert(plan("bulk")._1 < 100L, "bulk must down-sample")
    // replay agrees on the fixture too
    val expected = replayMixture(docs.map { case (id, t, s) => (id, s, t) })
    assert(expected("rare999")._5 == 400L && expected("bulk")._5 == plan("bulk")._1)
  }

  /** Brute-force source-overlap matrix: distinct aligned 20-token passage
    * sets per source, pairwise intersections — plain Scala collections.
    */
  private def replayOverlap(docs: Seq[(String, String)])
      : Map[(String, String), (Long, Long, Long, Double)] = {
    val bySource = docs.groupBy(_._1).map { case (s, rs) =>
      s -> rs.flatMap { case (_, text) =>
        val toks = sqlSplit(text)
        if (toks.length < 20) Nil
        else (0 until toks.length / 20).map(i =>
          toks.slice(i * 20, i * 20 + 20).mkString(" "))
      }.toSet
    }
    val ss = bySource.keys.toSeq.sorted
    (for {
      i <- ss.indices; j <- (i + 1) until ss.length
      (a, b) = (ss(i), ss(j))
      shared = (bySource(a) & bySource(b)).size if shared > 0
    } yield (a, b) -> (shared.toLong, bySource(a).size.toLong,
      bySource(b).size.toLong,
      shared.toDouble / (bySource(a).size + bySource(b).size - shared))).toMap
  }

  /** Driver-side recompute of the α = 1/2 temperature plan over
    * (doc_id, source, n_toks) rows. The integer sqrt is INDEPENDENT of
    * the engine's guarded FLOOR(SQRT) fold: java.math.BigInteger.sqrt
    * computes the exact floor root with no floating point at all.
    */
  private def replayTemperature(rows: Seq[(Long, String, Long)])
      : Map[String, (Long, Long, Long, Long, Long, Long, Long)] = {
    def isqrt(n: Long): Long =
      java.math.BigInteger.valueOf(n).sqrt().longValueExact()
    val perSource = rows.groupBy(_._2).map { case (s, rs) =>
      s -> (rs.size.toLong, rs.map(_._3).sum)
    }
    val budget = perSource.values.map(_._2).sum
    val sTotal = perSource.values.map(v => isqrt(v._2)).sum
    perSource.map { case (s, (nDocs, nTokens)) =>
      val w = isqrt(nTokens)
      val desired = (BigInt(budget) * w / sTotal).toLong
      val epochsQ2 = math.min(400L, 100L * desired / nTokens)
      val copies = rows.filter(_._2 == s).map { case (id, _, toks) =>
        val c = epochsQ2 / 100 + (if (hashBucket(id) < epochsQ2 % 100) 1L else 0L)
        (c, c * toks)
      }
      s -> (nDocs, nTokens, w, desired, epochsQ2,
        copies.map(_._1).sum, copies.map(_._2).sum)
    }
  }

  private def collectTemperature(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      r.getAs[String]("source") -> (
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("isqrt_w"), r.getAs[Long]("desired_tokens"),
        r.getAs[Long]("epochs_q2"),
        r.getAs[Long]("docs_emitted"), r.getAs[Long]("tokens_emitted"))
    }.toMap

  test("temperature_mix matches the BigInteger-sqrt replay at sf0.001") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        sqlSplit(r.getString(2)).length.toLong)).toSeq
    val expected = replayTemperature(docs)
    val got = collectTemperature(PipelineOps.temperatureMix(spark, sf))
    assert(got.keySet == expected.keySet)
    for ((s, exp) <- expected) assert(got(s) == exp, s"source $s")
    // α = 1/2 on a near-uniform corpus must still flatten both ways
    val eq2 = got.values.map(_._5)
    assert(eq2.exists(_ < 100), "no down-sampled source in fixture")
    assert(eq2.exists(_ > 100), "no up-sampled source in fixture")
  }

  test("temperature_mix caps a tiny source at 4 epochs and interacts with the cap exactly") {
    import spark.implicits._
    // rare: 2 docs × 10 tokens; bulk: 198 × 10. desired_rare ≈
    // √(20·1980) ≈ 199 ≥ 4·20, so the cap binds; bulk must down-sample.
    val rows: Seq[(Long, String, Long)] =
      (0L until 2L).map((_, "rare", 10L)) ++ (2L until 200L).map((_, "bulk", 10L))
    val expected = replayTemperature(rows)
    assert(expected("rare")._5 == 400L, "fixture must bind the cap")
    assert(expected("bulk")._5 < 100L, "fixture must down-sample bulk")
    // capped emission: exactly 4 copies of each rare doc, no hash gate
    assert(expected("rare")._6 == 8L && expected("rare")._7 == 80L)
    val got = collectTemperature(PipelineOps.temperatureMixFrom(
      rows.toDF("doc_id", "source", "n_toks")))
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("the guarded FLOOR(SQRT) fold is the exact integer sqrt at perfect-square boundaries") {
    import spark.implicits._
    // n = k², k²−1, k²+1 near 2^26 — exactly where a correctly-rounded
    // double sqrt can land on either side of the integer
    val k = 67108859L // prime near 2^26
    val ns = Seq(k * k - 1, k * k, k * k + 1, 4L, 3L, 1L, 2L)
    val rows = ns.zipWithIndex.map { case (n, i) => (i.toLong, s"s$i", n) }
    val got = collectTemperature(PipelineOps.temperatureMixFrom(
      rows.toDF("doc_id", "source", "n_toks")))
    for ((n, i) <- ns.zipWithIndex) {
      val exact = java.math.BigInteger.valueOf(n).sqrt().longValueExact()
      assert(got(s"s$i")._3 == exact, s"isqrt($n)")
    }
  }

  test("recency_mix matches the half-life integer replay; decay and gate both bite") {
    import java.time.LocalDate
    import java.time.temporal.ChronoUnit
    val rows = graft.model.Tables.events(spark, sf)
      .selectExpr("event_id", "event_type",
        "CAST(to_date(ts) AS STRING) AS d").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        LocalDate.parse(r.getAs[String]("d"))))
    val horizon = rows.map(_._3).maxBy(_.toEpochDay)
    val expected = rows.groupBy { case (_, t, d) =>
      (t, math.min(ChronoUnit.DAYS.between(d, horizon) / 7, 20L))
    }.map { case ((t, b), g) =>
      val pct = 100L / (1L << b)
      (t, b) -> (g.length.toLong, pct,
        g.count { case (id, _, _) => hashBucket(id) < pct }.toLong)
    }
    val got = SparkEntry.queries("recency_mix")(spark, sf).collect().map { r =>
      (r.getAs[String]("event_type"), r.getAs[Long]("bucket")) -> (
        r.getAs[Long]("n_events"), r.getAs[Long]("keep_pct"),
        r.getAs[Long]("n_kept"))
    }.toMap
    assert(got == expected, s"got $got\nexpected $expected")
    // decay is real on this fixture: several buckets, and in some
    // partial-pct bucket the hash gate both keeps and drops
    assert(expected.keySet.map(_._2).size >= 3, "fewer than 3 age buckets")
    assert(expected.exists { case ((_, b), (n, pct, kept)) =>
      pct < 100 && kept > 0 && kept < n
    }, "no bucket where the gate splits — vacuous")
  }

  test("source_overlap equals brute set intersection on a planted-leak fixture") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_leak").toString
    def passage(tag: String) = (1 to 20).map(i => s"$tag$i").mkString(" ")
    val leaked = passage("shared")
    val leaked2 = passage("boiler")
    // crawlA and vendorB share `leaked` (at DIFFERENT aligned offsets but
    // the same 20-token alignment); vendorB and crawlC share `leaked2`;
    // crawlA–crawlC share nothing. A 39-token doc contributes only ONE
    // passage (the tail 19 tokens are sub-window and must not count).
    val docs = Seq(
      ("crawlA", s"$leaked ${passage("a1")}"),
      ("crawlA", s"${passage("a2")} $leaked"),
      ("crawlA", s"${passage("a3")} ${passage("a4").split(" ").init.mkString(" ")}"),
      ("vendorB", s"$leaked ${passage("b1")}"),
      ("vendorB", s"$leaked2 ${passage("b2")}"),
      ("crawlC", s"${passage("c1")} $leaked2"),
      ("crawlC", passage("c2")))
    docs.zipWithIndex.map { case ((s, t), i) => (i.toLong, t, s) }
      .toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val expected = replayOverlap(docs)
    assert(expected.keySet ==
      Set(("crawlA", "vendorB"), ("crawlC", "vendorB")), "fixture shape")
    assert(expected(("crawlA", "vendorB"))._1 == 1L)
    val got = PipelineOps.sourceOverlap(spark, dir).collect().map { r =>
      (r.getAs[String]("source_a"), r.getAs[String]("source_b")) -> (
        r.getAs[Long]("n_shared"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Double]("jaccard"))
    }.toMap
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("corpus_pipeline equals a recomposition of the standalone ops' outputs") {
    // clean via corpus_clean's OWN output, split via train_test_split's
    // OWN labels, packing recomputed in Scala — the composed op must be
    // exactly the composition of its parts, not a lookalike
    val cleaned = SparkEntry.queries("corpus_clean")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Int]("n_tokens")))
    val split = SparkEntry.queries("train_test_split")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val train = cleaned.filter { case (id, _, _) => split(id) == "train" }
    val expected = train.groupBy(_._2).map { case (lang, docs) =>
      val sorted = docs.sortBy(_._1)
      var cum = 0L
      var maxPack = 0L
      for ((_, _, n) <- sorted) { maxPack = math.max(maxPack, cum / 2048); cum += n }
      lang -> (docs.length.toLong, docs.map(_._3.toLong).sum, maxPack + 1,
        docs.map(_._3.toLong).sum.toDouble / docs.length)
    }
    val got = SparkEntry.queries("corpus_pipeline")(spark, sf).collect()
      .map(r => r.getAs[String]("lang") -> (
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_packs"), r.getAs[Double]("tokens_per_doc"))).toMap
    assert(got == expected, s"got $got\nexpected $expected")
    assert(got.nonEmpty && got.values.exists(_._3 > 1),
      "no multi-pack lang — packing stage vacuous")
  }

  test("source_overlap matches the brute replay at sf0.001") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val expected = replayOverlap(docs)
    val got = PipelineOps.sourceOverlap(spark, sf).collect().map { r =>
      (r.getAs[String]("source_a"), r.getAs[String]("source_b")) -> (
        r.getAs[Long]("n_shared"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Double]("jaccard"))
    }.toMap
    assert(got == expected)
    assert(got.nonEmpty, "corpus must plant at least one cross-source leak")
  }
}
