package graft

import org.apache.spark.sql.functions.col
import graft.model.Tables
import graft.ops.{PipelineOps, QualityOps, SimilarityOps, StatsOps}

/** Ground truth for the round-11 stats/graph/governance additions:
  * straight-line textbook replays over the collected fixture, compared
  * EXACTLY — each engine op is integer arithmetic to a final boundary of
  * correctly-rounded IEEE steps (or a floor-quantized ln for PMI), so the
  * replay's doubles must match bit-for-bit.
  */
class LinkStatsSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  // ties in the cents-quantized values need the denser fixture (the
  // MannWhitneySpec precedent) — used by the KS/AUC tie paths
  private val sfTies = "/root/testdata/sf0.01"

  test("ks_test: D and z match a textbook two-ECDF max computation") {
    val rows = Tables.events(spark, sfTies)
      .filter(col("event_type") === "purchase")
      .selectExpr("CAST(value AS DECIMAL(18,2)) AS v", "user_id % 2 AS arm")
      .collect()
      .map(r => (r.getDecimal(0), r.getLong(1)))
    val na = rows.count(_._2 == 0L)
    val nb = rows.count(_._2 == 1L)
    // walk the distinct values in order, tracking both inclusive ECDFs
    val byV = rows.groupBy(_._1).toSeq.sortBy(_._1)
    var cuma = 0L; var cumb = 0L; var numer = BigInt(0)
    for ((_, grp) <- byV) {
      cuma += grp.count(_._2 == 0L)
      cumb += grp.count(_._2 == 1L)
      val d = (BigInt(cuma) * nb - BigInt(cumb) * na).abs
      if (d > numer) numer = d
    }
    val naD = na.toDouble; val nbD = nb.toDouble
    val dStat = numer.toDouble / (naD * nbD)
    val z = dStat * math.sqrt(naD * nbD / (naD + nbD))

    val got = StatsOps.ksTest(spark, sfTies).collect()(0)
    assert(got.getAs[Long]("n_a") == na && got.getAs[Long]("n_b") == nb)
    assert(got.getAs[Double]("d_stat") == dStat)
    assert(got.getAs[Double]("z") == z)
    assert(dStat > 0.0, "degenerate fixture: identical cohorts")
  }

  test("roc_auc: matches O(n^2) pair counting — wins + half-ties over all pairs") {
    val rows = Tables.events(spark, sfTies)
      .filter(col("value").isNotNull)
      .selectExpr("CAST(value AS DECIMAL(18,2)) AS v",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos")
      .collect()
      .map(r => (r.getDecimal(0), r.getInt(1)))
    val posV = rows.filter(_._2 == 1).map(_._1)
    val negV = rows.filter(_._2 == 0).map(_._1)
    var wins = 0L; var ties = 0L
    for (p <- posV; n <- negV) {
      val c = p.compareTo(n)
      if (c > 0) wins += 1 else if (c == 0) ties += 1
    }
    // U = wins + ties/2; the engine converts the exact integer 2U to
    // double, halves, then divides — mirror those exact steps
    val u2 = BigInt(2) * wins + ties
    val npD = posV.length.toDouble; val nnD = negV.length.toDouble
    val auc = u2.toDouble / 2.0 / (npD * nnD)

    val got = StatsOps.rocAuc(spark, sfTies).collect()(0)
    assert(got.getAs[Long]("n_pos") == posV.length.toLong)
    assert(got.getAs[Long]("n_neg") == negV.length.toLong)
    assert(got.getAs[Double]("auc") == auc)
    assert(got.getAs[Double]("gini") == 2.0 * auc - 1.0)
    assert(ties > 0, "no tied scores across classes — tie path vacuous")
  }

  test("pr_curve: suffix tp/fp over descending thresholds matches a driver sweep") {
    val rows = Tables.events(spark, sfTies)
      .filter(col("value").isNotNull)
      .selectExpr("CAST(value AS DECIMAL(18,2)) AS v",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos")
      .collect()
      .map(r => (r.getDecimal(0), r.getInt(1)))
    val nPos = rows.count(_._2 == 1).toLong
    assert(nPos > 0)
    var tp = 0L; var fp = 0L
    val exp = rows.groupBy(_._1).toSeq.sortBy(_._1).reverse.map {
      case (v, grp) =>
        tp += grp.count(_._2 == 1)
        fp += grp.count(_._2 == 0)
        v.doubleValue -> ((tp, fp, nPos - tp,
          tp.toDouble / (tp + fp).toDouble, tp.toDouble / nPos.toDouble))
    }.toMap
    val got = SparkEntry.queries("pr_curve")(spark, sfTies).collect()
      .map(r => r.getAs[Double]("threshold") ->
        ((r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn"),
          r.getAs[Double]("prec"), r.getAs[Double]("recall")))).toMap
    assert(got == exp)
    // non-vacuity: the sweep is a real curve — interior points with
    // precision and recall both strictly inside (0, 1), and the lowest
    // threshold recalls everything
    assert(got.values.exists(v => v._4 > 0 && v._4 < 1 && v._5 > 0 && v._5 < 1))
    assert(got.values.exists(_._5 == 1.0), "no full-recall endpoint")
  }

  test("mutual_info: pmi_q9 matches a driver recompute with identical IEEE steps") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_linestatus"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val joint = li.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val mx = li.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val my = li.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val n = li.length.toLong
    val got = StatsOps.mutualInfo(spark, sf).collect()
    assert(got.length == joint.size)
    for (row <- got) {
      val key = (row.getAs[String]("flag"), row.getAs[String]("status"))
      val nxy = joint(key)
      assert(row.getAs[Long]("n_xy") == nxy)
      assert(row.getAs[Long]("n_x") == mx(key._1))
      assert(row.getAs[Long]("n_y") == my(key._2))
      val pmi = math.log(nxy.toDouble * n.toDouble /
        (mx(key._1).toDouble * my(key._2).toDouble))
      assert(row.getAs[Long]("pmi_q9") == math.floor(pmi * 1e9).toLong)
    }
    // dependence must actually exist or the op is a constant-zero check
    assert(got.exists(_.getAs[Long]("pmi_q9") != 0L))
  }

  test("chi_square: statistic/df/decision match a driver recompute with identical IEEE steps") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_linestatus"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val joint = li.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val mx = li.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val my = li.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val n = li.length.toLong
    val chi2q6 = joint.map { case ((f, s), nxy) =>
      val dev = (nxy * n - mx(f) * my(s)).toDouble
      math.floor((dev * dev) / ((n.toDouble * mx(f)) * my(s)) * 1e6).toLong
    }.sum
    val df = (mx.size - 1) * (my.size - 1)
    val got = StatsOps.chiSquare(spark, sf).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getAs[Int]("df") == df)
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("chi2_q6") == chi2q6)
    assert(r.getAs[Long]("crit_q6") == StatsOps.ChiSqCrit05Q6(df - 1))
    assert(r.getAs[Boolean]("reject") == (chi2q6 > StatsOps.ChiSqCrit05Q6(df - 1)))
    // flag/status are near-independent in the fixture only if χ² is tiny;
    // either decision is fine, but the statistic must be non-degenerate
    assert(chi2q6 != 0L, "χ² exactly zero — independence fixture vacuous")
  }

  test("link_prediction: top-100 matches brute-force blocked common-neighbor search") {
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brand = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_brand"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val edges = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    for ((a, b) <- edges) {
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    // candidates blocked on brand; centers of ANY brand contribute, so
    // cn is the exact common-neighbor count for every eligible pair.
    // RA rides each wedge as the integer weight 10^12 div deg(center).
    val cn = scala.collection.mutable.Map.empty[(Long, Long), Long]
    val ra = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for ((z, nbrs) <- adj; s = nbrs.toSeq.sorted;
         i <- s.indices; j <- (i + 1) until s.length) {
      val k = (s(i), s(j))
      if (brand(k._1) == brand(k._2) && !edges.contains(k)) {
        cn(k) = cn.getOrElse(k, 0L) + 1L
        ra(k) = ra.getOrElse(k, 0L) + 1000000000000L / adj(z).size
      }
    }
    val expect = cn.toSeq
      .map { case ((a, b), c) =>
        val da = adj(a).size.toLong; val db = adj(b).size.toLong
        (a, b, brand(a), c, da, db, c.toDouble / (da + db - c).toDouble,
          ra((a, b)))
      }
      .sortBy { case (a, b, _, c, _, _, _, _) => (-c, a, b) }
      .take(100)

    val got = StatsOps.linkPrediction(spark, sf).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[String]("brand"), r.getAs[Long]("cn"),
        r.getAs[Long]("deg_a"), r.getAs[Long]("deg_b"), r.getAs[Double]("jaccard"),
        r.getAs[Long]("ra_q12")))
    assert(got.toSeq == expect)
    assert(expect.nonEmpty && expect.head._4 >= 2,
      "fixture too sparse: best candidate shares < 2 neighbors")
    // RA must disagree with cn's ordering somewhere or the index is
    // redundant on this fixture (hub down-weighting must have bite)
    assert(expect.map(_._8).distinct.length > 1, "ra_q12 degenerate")
  }

  test("k_anonymity: ladder censuses match brute-force grouping") {
    val nat = Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_regionkey"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val cust = Tables.customer(spark, sf)
      .select(col("c_nationkey"), col("c_mktsegment"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    val k = QualityOps.KAnonThreshold
    def census(keys: Seq[Any]): (Long, Long, Long, Long) = {
      val grps = keys.groupBy(identity).values.map(_.length.toLong).toSeq
      (grps.length.toLong, grps.min,
        grps.filter(_ < k).sum, grps.count(_ < k).toLong)
    }
    val expect = Map(
      "nation_segment" -> census(cust.map { case (nk, s) => (nk, s) }),
      "region_segment" -> census(cust.map { case (nk, s) => (nat(nk), s) }),
      "segment"        -> census(cust.map(_._2)))
    val got = QualityOps.kAnonymity(spark, sf).collect()
    assert(got.length == 3)
    for (row <- got) {
      val e = expect(row.getAs[String]("level"))
      assert(row.getAs[Long]("n_groups") == e._1, row.toString)
      assert(row.getAs[Long]("min_k") == e._2, row.toString)
      assert(row.getAs[Long]("rows_at_risk") == e._3, row.toString)
      assert(row.getAs[Long]("groups_at_risk") == e._4, row.toString)
    }
    // the risk branch must fire somewhere on the fixture
    assert(expect.values.exists(_._4 > 0L), "no group under threshold — risk path vacuous")
  }

  test("l_diversity: distinct-band censuses match brute-force grouping") {
    val nat = Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_regionkey"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val cust = Tables.customer(spark, sf)
      .select(col("c_nationkey"), col("c_mktsegment"), col("c_acctbal"))
      .collect().map(r =>
        (r.getInt(0), r.getString(1), math.floor(r.getDouble(2) / 1000.0).toLong))
    val lThr = QualityOps.LDivThreshold
    def census(grouped: Seq[(Any, Long)]): (Long, Long, Long, Long) = {
      val grps = grouped.groupBy(_._1).values
        .map(g => (g.map(_._2).distinct.length.toLong, g.length.toLong)).toSeq
      (grps.length.toLong, grps.map(_._1).min,
        grps.count(_._1 < lThr).toLong,
        grps.filter(_._1 < lThr).map(_._2).sum)
    }
    val expect = Map(
      "nation_segment" -> census(cust.map { case (nk, s, b) => ((nk, s): Any, b) }),
      "region_segment" -> census(cust.map { case (nk, s, b) => ((nat(nk), s): Any, b) }),
      "segment"        -> census(cust.map { case (_, s, b) => (s: Any, b) }))
    val got = QualityOps.lDiversity(spark, sf).collect()
    assert(got.length == 3)
    for (row <- got) {
      val e = expect(row.getAs[String]("level"))
      assert(row.getAs[Long]("n_groups") == e._1, row.toString)
      assert(row.getAs[Long]("min_l") == e._2, row.toString)
      assert(row.getAs[Long]("groups_below") == e._3, row.toString)
      assert(row.getAs[Long]("rows_at_risk") == e._4, row.toString)
    }
    // the low-diversity branch must fire somewhere on the fixture, and
    // the ladder must not be flat (generalizing up raises realized l)
    assert(expect.values.exists(_._3 > 0L), "no group under l — risk path vacuous")
    assert(expect("segment")._2 >= expect("nation_segment")._2,
      "coarser QI must not lower realized l")
  }

  test("t_closeness: prefix-sum EMD censuses match brute-force replay") {
    val nat = Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_regionkey"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val cust = Tables.customer(spark, sf)
      .select(col("c_nationkey"), col("c_mktsegment"), col("c_acctbal"))
      .collect().map(r =>
        (r.getInt(0), r.getString(1), math.floor(r.getDouble(2) / 1000.0).toLong))
    val bands = cust.map(_._3).distinct.sorted
    val nT = cust.length.toLong
    val globalCum = bands.map(b => b -> cust.count(_._3 <= b).toLong).toMap
    val den0 = (bands.length - 1).toLong
    def census(grouped: Seq[(Any, Long)]): (Long, Double, Long, Long) = {
      val grps = grouped.groupBy(_._1).values.map { g =>
        val nC = g.length.toLong
        val emdNum = bands.map { b =>
          val pCum = g.count(_._2 <= b).toLong
          math.abs(pCum * nT - globalCum(b) * nC)
        }.sum
        (nC, emdNum, den0 * nC * nT)
      }.toSeq
      (grps.length.toLong,
        grps.map(x => x._2.toDouble / x._3.toDouble).max,
        grps.count(x => x._2 * QualityOps.TCloseDen > x._3 * QualityOps.TCloseNum).toLong,
        grps.filter(x => x._2 * QualityOps.TCloseDen > x._3 * QualityOps.TCloseNum)
          .map(_._1).sum)
    }
    val expect = Map(
      "nation_segment" -> census(cust.map { case (nk, s, b) => ((nk, s): Any, b) }),
      "region_segment" -> census(cust.map { case (nk, s, b) => ((nat(nk), s): Any, b) }),
      "segment"        -> census(cust.map { case (_, s, b) => (s: Any, b) }))
    val got = QualityOps.tCloseness(spark, sf).collect()
    assert(got.length == 3)
    for (row <- got) {
      val e = expect(row.getAs[String]("level"))
      assert(row.getAs[Long]("n_groups") == e._1, row.toString)
      assert(row.getAs[Double]("max_t") == e._2, row.toString)
      assert(row.getAs[Long]("groups_violating") == e._3, row.toString)
      assert(row.getAs[Long]("rows_at_risk") == e._4, row.toString)
    }
    // the violation branch must fire somewhere, and generalizing up the
    // ladder must not worsen closeness (coarser groups track the global
    // distribution at least as well at the max)
    assert(expect.values.exists(_._3 > 0L), "no group past t — violation path vacuous")
    assert(expect("segment")._2 <= expect("nation_segment")._2,
      "coarser QI must not raise max EMD")
  }

  test("seasonal_decompose: exact-rational replay; additive identity holds") {
    val days = Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.to_date(col("ts")).as("d"))
      .collect().map(_.getDate(0).toLocalDate)
    val daily = days.groupBy(identity).map { case (d, v) => d -> v.length.toLong }
    val sorted = daily.keys.toSeq.sorted(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
    // the engine computes the CALENDAR-centered window (±3 days via
    // scatter + re-aggregate); on the gapless fixture that equals this
    // consecutive-index replay — assert the precondition so a gapped
    // future fixture fails loudly here instead of silently diverging
    assert(sorted.zip(sorted.tail).forall { case (a, b) =>
      b.toEpochDay == a.toEpochDay + 1 }, "events fixture has calendar gaps")
    val tn: Map[java.time.LocalDate, Option[Long]] = sorted.zipWithIndex.map {
      case (d, i) =>
        val full = i >= 3 && i + 3 < sorted.length
        d -> (if (full) Some((i - 3 to i + 3).map(j => daily(sorted(j))).sum)
              else None)
    }.toMap
    val detNum = sorted.collect {
      case d if tn(d).isDefined => d -> (7L * daily(d) - tn(d).get)
    }.toMap
    def wd(d: java.time.LocalDate): Int = (((d.toEpochDay % 7) + 7) % 7).toInt
    val seas = detNum.keys.groupBy(wd).map { case (w, ds) =>
      w -> (ds.map(detNum).sum, ds.size.toLong)
    }
    val got = StatsOps.seasonalDecompose(spark, sf).collect()
    assert(got.length == sorted.length)
    for (r <- got) {
      val d = java.time.LocalDate.parse(r.getAs[String]("day"))
      assert(r.getAs[Int]("wd") == wd(d))
      assert(r.getAs[Long]("volume") == daily(d))
      val trend = Option(r.getAs[java.lang.Double]("trend")).map(_.doubleValue)
      assert(trend == tn(d).map(_.toDouble / 7.0), s"trend $d")
      val (sNum, nW) = seas(wd(d))
      assert(r.getAs[Double]("seasonal") == sNum.toDouble / (7.0 * nW))
      val resid = Option(r.getAs[java.lang.Double]("residual")).map(_.doubleValue)
      tn(d) match {
        case Some(_) =>
          val e = (detNum(d) * nW - sNum).toDouble / (7.0 * nW)
          assert(resid.contains(e), s"residual $d")
          // additive identity: exact in rationals, ~1 ulp in doubles
          assert(math.abs(daily(d).toDouble -
            (trend.get + sNum.toDouble / (7.0 * nW) + e)) < 1e-9)
        case None => assert(resid.isEmpty, s"edge day $d must have null residual")
      }
    }
    // non-vacuity: a weekly pattern must exist (some seasonal ≠ 0) and
    // both edge (null-trend) and interior days occur
    assert(seas.values.exists(_._1 != 0L), "all seasonal zero — no weekly pattern")
    assert(tn.values.exists(_.isEmpty) && tn.values.exists(_.isDefined))
  }

  test("dp_count: threshold ladder IS the exact rational CDF; release matches a replay") {
    import QualityOps._
    val B = DpNoiseBound
    // ladder vs the textbook two-sided-geometric CDF at α = 1/2, computed
    // independently in exact rationals: CDF(k≤0) = 2^(k+1)/3,
    // CDF(k>0) = 1 − 2^(−k)/3; S(k) = CDF(k)·3·2^B·P
    for ((s, idx) <- DpThresholds.zipWithIndex) {
      val k = idx - B
      val num = // CDF(k) · 3 · 2^B as an exact integer
        if (k <= 0) BigInt(2).pow(k + 1 + B)
        else BigInt(3) * BigInt(2).pow(B) - BigInt(2).pow(B - k)
      assert(BigInt(s) == num * DpHashP, s"ladder at k=$k")
    }
    assert(DpThresholds == DpThresholds.sorted, "ladder must be monotone")
    // release replay
    val cust = Tables.customer(spark, sf)
      .select(col("c_nationkey")).collect().map(_.getInt(0))
    val trueN = cust.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    def noise(nk: Int): Long = {
      val h = BigInt(nk) % DpHashP * BigInt(2654435761L) % DpHashP
      val x = h * (3L * (1L << B))
      DpThresholds.count(s => x >= s).toLong - B
    }
    val got = QualityOps.dpCount(spark, sf).collect()
    assert(got.length == trueN.size)
    for (r <- got) {
      val nk = r.getAs[Int]("c_nationkey")
      assert(r.getAs[Long]("noisy_count") == trueN(nk) + noise(nk), s"nation $nk")
      assert(r.getAs[Long]("epsilon_q6") == DpEpsilonQ6)
      assert(r.getAs[Int]("noise_bound") == B)
    }
    // the mechanism must actually perturb: some group's noise is nonzero,
    // and all noise stays inside the truncation bound
    val noises = trueN.keys.map(noise)
    assert(noises.exists(_ != 0L), "all noise zero — mechanism vacuous")
    assert(noises.forall(n => n >= -B && n <= B))
    // both signs occur across the hash-spread groups (distribution sanity)
    assert(noises.exists(_ > 0L) && noises.exists(_ < 0L),
      "noise never changes sign across 25 groups — suspicious u spread")
  }

  test("dp_sum/dp_avg: per-record clamp bounds sensitivity; releases match a replay") {
    import QualityOps._
    val B = DpNoiseBound
    val rows = Tables.customer(spark, sf)
      .selectExpr("c_nationkey",
        "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    // the clamp boundary is REAL on this fixture: records exist below 0
    // (floor engages) and above the clamp (ceiling engages)
    assert(rows.exists(_._2 < 0L), "no negative balances — clamp floor vacuous")
    assert(rows.exists(_._2 > DpClampCents),
      "no balance above clamp — ceiling vacuous")
    val clamped = rows.groupBy(_._1).map { case (k, v) =>
      k -> v.map(x => math.min(math.max(x._2, 0L), DpClampCents)).sum
    }
    val trueN = rows.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    def noise(key: Long): Long = {
      val h = BigInt(key) % DpHashP * BigInt(2654435761L) % DpHashP
      val x = h * (3L * (1L << B))
      DpThresholds.count(s => x >= BigInt(s)).toLong - B
    }
    val gotSum = QualityOps.dpSum(spark, sf).collect()
    assert(gotSum.length == trueN.size)
    for (r <- gotSum) {
      val nk = r.getAs[Int]("c_nationkey")
      assert(r.getAs[Long]("noisy_sum_cents")
        == clamped(nk) + DpClampCents * noise(nk + DpSumKeyOff), s"nation $nk")
      assert(r.getAs[Long]("clamp_cents") == DpClampCents)
      assert(r.getAs[Long]("epsilon_q6") == DpEpsilonQ6)
    }
    val gotAvg = QualityOps.dpAvg(spark, sf).collect()
    assert(gotAvg.length == trueN.size)
    for (r <- gotAvg) {
      val nk = r.getAs[Int]("c_nationkey")
      val ns = clamped(nk) + DpClampCents * noise(nk + DpSumKeyOff)
      val ncnt = trueN(nk) + noise(nk + DpAvgCntKeyOff)
      assert(r.getAs[Long]("noisy_sum_cents") == ns, s"nation $nk")
      assert(r.getAs[Long]("noisy_count") == ncnt, s"nation $nk")
      if (ncnt > 0)
        assert(r.getAs[Double]("noisy_avg")
          == ns.toDouble / (100L * ncnt).toDouble, s"nation $nk")
      else assert(r.isNullAt(r.fieldIndex("noisy_avg")), s"nation $nk")
      // composed privacy budget: sum leg + count leg
      assert(r.getAs[Long]("epsilon_q6") == 2L * DpEpsilonQ6)
    }
    // the two legs draw INDEPENDENT noise (distinct permKey offsets)
    assert(trueN.keys.exists(nk =>
      noise(nk + DpSumKeyOff) != noise(nk + DpAvgCntKeyOff)),
      "sum and count legs drew identical noise everywhere — offsets vacuous")
  }

  test("dp_noisy_max: winner identity matches a replay; scores never surface") {
    import QualityOps._
    val B = DpNoiseBound
    val cust = Tables.customer(spark, sf)
      .select(col("c_nationkey")).collect().map(_.getInt(0))
    val trueN = cust.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    def noise(key: Long): Long = {
      val h = BigInt(key) % DpHashP * BigInt(2654435761L) % DpHashP
      val x = h * (3L * (1L << B))
      DpThresholds.count(s => x >= BigInt(s)).toLong - B
    }
    val winner = trueN.keys.toSeq
      .sortBy(nk => (-(trueN(nk) + noise(nk + DpMaxKeyOff)), nk)).head
    val got = QualityOps.dpNoisyMax(spark, sf).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Int]("winner_nationkey") == winner)
    assert(got(0).getAs[Long]("n_candidates") == trueN.size.toLong)
    // release surface: identity + params ONLY — no score column leaks
    assert(got(0).schema.fieldNames.toSet ==
      Set("winner_nationkey", "n_candidates", "epsilon_q6", "noise_bound"))
    // selection noise actually mattered at least in principle: the noisy
    // argmax tiebreak path is deterministic (re-run identical)
    val again = QualityOps.dpNoisyMax(spark, sf).collect()
    assert(again(0).getAs[Int]("winner_nationkey") == winner)
  }

  test("dp_topk: ranked release matches replay AND the iterated-argmax peeling") {
    import QualityOps._
    val B = DpNoiseBound
    val cust = Tables.customer(spark, sf)
      .select(col("c_nationkey")).collect().map(_.getInt(0))
    val trueN = cust.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    def noise(key: Long): Long = {
      val h = BigInt(key) % DpHashP * BigInt(2654435761L) % DpHashP
      val x = h * (3L * (1L << B))
      DpThresholds.count(s => x >= BigInt(s)).toLong - B
    }
    val noisy = trueN.map { case (nk, n) =>
      nk -> (n + noise(nk + DpTopkKeyOff))
    }
    val ranked = noisy.toSeq.sortBy { case (nk, s) => (-s, nk) }
      .map(_._1).take(DpTopkK)
    // the one-shot prefix IS the peeling: argmax, remove, argmax again
    var pool = noisy
    val peeled = (1 to DpTopkK).map { _ =>
      val w = pool.minBy { case (nk, s) => (-s, nk) }._1
      pool = pool - w
      w
    }
    assert(ranked == peeled, "one-shot prefix diverged from iterated argmax")
    val got = QualityOps.dpTopk(spark, sf).collect().sortBy(_.getAs[Int]("release_rank"))
    assert(got.length == DpTopkK)
    for ((r, i) <- got.zipWithIndex) {
      assert(r.getAs[Int]("release_rank") == i + 1)
      assert(r.getAs[Int]("winner_nationkey") == ranked(i), s"rank ${i + 1}")
      assert(r.getAs[Long]("n_candidates") == trueN.size.toLong)
      assert(r.getAs[Long]("epsilon_q6") == DpTopkK.toLong * DpEpsilonQ6)
    }
    // identities and order only — no score column leaks
    assert(got(0).schema.fieldNames.toSet == Set("release_rank",
      "winner_nationkey", "n_candidates", "epsilon_q6", "noise_bound"))
  }

  test("dp_quantile: exponential-mechanism median matches a straight-line replay; randomness is real") {
    import QualityOps._
    val nB = DpQuantBands
    val w = DpQuantBandCents
    val b = DpNoiseBound
    assert(DpClampCents == nB.toLong * w, "band ladder must tile the clamp range exactly")
    val rows = Tables.customer(spark, sfTies)
      .selectExpr("c_nationkey",
        "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val byNation = rows.groupBy(_._1).map { case (k, v) =>
      k -> v.map(x => math.min(math.max(x._2, 0L), DpClampCents))
    }
    def replay(nk: Int): (Long, Long) = { // (released cents, greedy jstar-free pick)
      val vs = byNation(nk)
      val cnts = Array.fill(nB)(0L)
      vs.foreach(v => cnts(math.min((v / w).toInt, nB - 1)) += 1)
      val ranks = (0 to nB).map(j => cnts.take(j).sum)
      val t = (vs.size + 1L) / 2L
      val us = ranks.map(r => -math.abs(r - t))
      val umax = us.max
      val ws = us.map(u => 1L << math.max(u - umax + b, 0L).toInt)
      val cums = ws.scanLeft(0L)(_ + _).tail
      val h = (BigInt(nk + DpQuantKeyOff) % DpHashP * BigInt(2654435761L)
        % DpHashP).toLong
      val jstar = cums.count(c => h * cums.last >= c * DpHashP).toLong
      val greedy = us.indexOf(umax).toLong
      (jstar * w, greedy * w)
    }
    val got = QualityOps.dpQuantile(spark, sfTies).collect()
    assert(got.length == byNation.size)
    for (r <- got) {
      val nk = r.getAs[Int]("c_nationkey")
      assert(r.getAs[Long]("noisy_median_cents") == replay(nk)._1, s"nation $nk")
      assert(r.getAs[Int]("n_candidates") == nB + 1)
      assert(r.getAs[Long]("clamp_cents") == DpClampCents)
      assert(r.getAs[Long]("epsilon_q6") == DpQuantEpsilonQ6)
      // release stays inside the clamp ladder
      val rel = r.getAs[Long]("noisy_median_cents")
      assert(rel >= 0L && rel <= DpClampCents)
    }
    // true ranks/counts never surface
    assert(got(0).schema.fieldNames.toSet == Set("c_nationkey",
      "noisy_median_cents", "n_candidates", "clamp_cents", "epsilon_q6"))
    // the mechanism genuinely randomizes: some nation releases a candidate
    // that is NOT the max-utility (greedy) boundary...
    assert(byNation.keys.exists(nk => replay(nk)._1 != replay(nk)._2),
      "every nation picked the greedy argmax — selection noise vacuous")
    // ...but mass still concentrates: most nations release within one band
    // of the greedy pick (2^-u decay), so the release is USEFUL
    val close = byNation.keys.count(nk =>
      math.abs(replay(nk)._1 - replay(nk)._2) <= 8L * w)
    assert(close * 10 >= byNation.size * 5,
      "over half the releases strayed > 8 bands from the true median — weights suspicious")
  }

  test("aqp_estimate: HT estimator matches a driver replay and covers the exact total") {
    val rows = Tables.lineitem(spark, sfTies)
      .selectExpr("l_returnflag", "l_orderkey",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val p = StatsOps.AqpRatePct
    def bucket(ok: Long): Long = ok % 1000000007L * 2654435761L % 1000000007L % 100L
    val sample = rows.filter { case (_, ok, _) => bucket(ok) < p }
    val perOrder = sample.groupBy { case (f, ok, _) => (f, ok) }
      .map { case ((f, _), g) => (f, g.length.toLong, g.map(_._3).sum) }.toSeq
    val expect = perOrder.groupBy(_._1).map { case (f, g) =>
      f -> (g.map(_._2).sum, g.length.toLong, g.map(_._3).sum,
        g.map(o => BigInt(o._3) * o._3).sum)
    }
    val got = StatsOps.aqpEstimate(spark, sfTies).collect()
      .map(r => r.getAs[String]("flag") -> r).toMap
    assert(got.keySet == expect.keySet)
    val up = 100L / p
    val vf = (100L - p) * 100L / (p.toLong * p)
    for ((f, (nRows, nOrd, sumY, sumY2)) <- expect) {
      val row = got(f)
      assert(row.getAs[Long]("n_sample_rows") == nRows, f)
      assert(row.getAs[Long]("n_sample_orders") == nOrd, f)
      assert(row.getAs[Long]("est_rows") == nRows * up, f)
      assert(row.getAs[Long]("est_revenue_cents") == sumY * up, f)
      assert(BigInt(row.getAs[Long]("y2_sum_cents2")) == sumY2, f)
      assert(row.getAs[Long]("ht_var_factor") == vf, f)
      // estimator quality: the exact total must sit inside ±3·se of the
      // estimate (a fixed fixture, so this is a deterministic check that
      // the variance formula is on the right scale, not a flaky one)
      val exact = rows.filter(_._1 == f).map(r => BigInt(r._3)).sum
      val se = math.sqrt((sumY2 * vf).toDouble)
      val err = (BigInt(sumY * up) - exact).abs.toDouble
      assert(err <= 3.0 * se, s"$f: err $err > 3se ${3 * se}")
      info(f"$f: est=${sumY * up} exact=$exact relErr=${err / exact.toDouble}%.4f se=$se%.0f")
    }
    // the sample must be non-degenerate: >1 order per flag
    assert(expect.values.forall(_._2 > 1L), "degenerate sample")
  }

  test("shortest_paths: 4-hop multi-source BFS matches a driver replay") {
    val edges = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey AS ok", "l_partkey AS pk").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values
      .flatMap { g =>
        val pks = g.map(_._2).distinct.sorted
        for (i <- pks.indices; j <- i + 1 until pks.length)
          yield (pks(i), pks(j))
      }.toSet
    val adj = (edges.toSeq.map(e => e._1 -> e._2) ++
      edges.toSeq.map(e => e._2 -> e._1))
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).toSeq }
    val seeds = adj.keys.filter(_ % StatsOps.BfsSeedMod == 0).toSeq.sorted
    assert(seeds.size > 1, "need >1 seed for the tie/nearest paths")
    // synchronous relaxation, min (d, seed) lexicographic
    var dist: Map[Long, (Int, Long)] = seeds.map(s => s -> (0, s)).toMap
    for (_ <- 1 to StatsOps.BfsMaxHops) {
      val cand = dist.toSeq.flatMap { case (v, (d, s)) =>
        adj.getOrElse(v, Seq.empty).map(u => u -> ((d + 1, s)))
      } ++ dist.toSeq
      dist = cand.groupBy(_._1).map { case (u, cs) => u -> cs.map(_._2).min }
    }
    val got = StatsOps.shortestPaths(spark, sf).collect()
      .map(r => r.getAs[Long]("node") ->
        ((r.getAs[Int]("dist"), r.getAs[Long]("nearest_seed")))).toMap
    assert(got == dist,
      s"only-got=${(got.keySet -- dist.keySet).take(5)} only-exp=${(dist.keySet -- got.keySet).take(5)}")
    // non-vacuity: multiple hop levels and multiple nearest seeds fire
    assert(got.values.map(_._1).toSet.size >= 2, "single hop level — BFS vacuous")
    assert(got.values.map(_._2).toSet.size >= 2, "single nearest seed — tie-break vacuous")
  }

  test("cv_folds: rotation counts match a driver replay; folds are balanced") {
    val docs = Tables.documents(spark, sfTies)
      .selectExpr("doc_id", "size(split(trim(text), ' ')) AS toks").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong))
    val k = PipelineOps.CvK
    def fold(id: Long): Int = (id % 1000000007L * 2654435761L % 1000000007L % k).toInt
    val byFold = docs.groupBy(d => fold(d._1))
      .map { case (f, g) => f -> (g.length.toLong, g.map(_._2).sum) }
    val tDocs = docs.length.toLong
    val tToks = docs.map(_._2).sum
    val got = PipelineOps.cvFolds(spark, sfTies).collect()
      .map(r => r.getAs[Int]("fold") -> r).toMap
    assert(got.keySet == byFold.keySet && got.size == k,
      s"folds ${got.keySet} — every fold must be populated")
    for ((f, (nd, nt)) <- byFold) {
      val row = got(f)
      assert(row.getAs[Long]("n_val_docs") == nd, s"fold $f")
      assert(row.getAs[Long]("n_val_tokens") == nt, s"fold $f")
      assert(row.getAs[Long]("n_train_docs") == tDocs - nd, s"fold $f")
      assert(row.getAs[Long]("n_train_tokens") == tToks - nt, s"fold $f")
    }
    // the property CV needs from the assignment: balanced folds
    val sizes = byFold.values.map(_._1)
    assert(sizes.max <= sizes.min * 1.2,
      s"fold imbalance ${sizes.min}..${sizes.max} exceeds 20%")
  }

  test("batch_padding: both batching plans match a driver replay; grouping wins") {
    val docs = Tables.documents(spark, sfTies)
      .selectExpr("doc_id", "size(split(trim(text), ' ')) AS toks").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong))
    def hkey(id: Long): Long = id % 1000000007L * 2654435761L % 1000000007L
    val b = PipelineOps.PadBatch
    def replay(grp: ((Long, Long)) => Long): (Long, Long, Long) = {
      val batches = docs.groupBy(grp).values.flatMap { g =>
        g.sortBy { case (id, _) => (hkey(id), id) }
          .grouped(b).map { batch =>
            (batch.length.toLong, batch.map(_._2).max, batch.map(_._2).sum)
          }
      }.toSeq
      (batches.length.toLong, batches.map(_._3).sum,
        batches.map(x => x._1 * x._2).sum)
    }
    val expect = Map(
      "grouped"    -> replay { case (_, t) => t / 64 },
      "hash_order" -> replay { case (id, _) => hkey(id) % 64 })
    val got = PipelineOps.batchPadding(spark, sfTies).collect()
      .map(r => r.getAs[String]("strategy") -> r).toMap
    assert(got.keySet == expect.keySet)
    for ((s, (nb, real, padded)) <- expect) {
      val row = got(s)
      assert(row.getAs[Long]("n_batches") == nb, s)
      assert(row.getAs[Long]("real_tokens") == real, s)
      assert(row.getAs[Long]("padded_tokens") == padded, s)
      assert(row.getAs[Double]("waste_frac") ==
        (padded - real).toDouble / padded.toDouble, s)
    }
    // the op's reason to exist: grouping by length must waste less
    assert(got("grouped").getAs[Double]("waste_frac") <
      got("hash_order").getAs[Double]("waste_frac"),
      "length grouping did not reduce padding on the fixture")
  }

  test("calibration_bins: exact integer binning matches a driver replay") {
    val rows = Tables.events(spark, sfTies)
      .filter(col("value").isNotNull)
      .selectExpr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc",
        "CASE WHEN event_type = 'purchase' THEN 1L ELSE 0L END AS pos")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mxc = rows.map(_._1).max
    val byBin = rows.groupBy { case (vc, _) => math.min(9L, vc * 10 / mxc) }
    val got = StatsOps.calibrationBins(spark, sfTies).collect()
      .map(r => r.getAs[Long]("bin") -> r).toMap
    assert(got.keySet == byBin.keySet)
    for ((bin, grp) <- byBin) {
      val n = grp.length.toLong
      val nPos = grp.map(_._2).sum
      val sumVc = grp.map(_._1).sum
      val row = got(bin)
      assert(row.getAs[Long]("n") == n, s"bin $bin")
      assert(row.getAs[Long]("n_pos") == nPos, s"bin $bin")
      assert(row.getAs[Double]("event_rate") == nPos.toDouble / n.toDouble)
      assert(row.getAs[Double]("mean_score") == sumVc.toDouble / (n * 100).toDouble)
    }
    // both the cap branch (bin 9 holds max) and interior bins must fire
    assert(byBin.contains(9L) && byBin.size >= 5, s"degenerate binning ${byBin.keySet}")
  }

  test("survival_curve: fulfillment life table matches an epoch-day driver replay") {
    val o = Tables.orders(spark, sfTies)
      .selectExpr("o_orderkey", "unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS ou")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = Tables.lineitem(spark, sfTies)
      .selectExpr("l_orderkey", "unix_micros(CAST(l_shipdate AS TIMESTAMP)) AS su")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mxU = o.values.max
    def day(us: Long): Long =
      java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L))
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toEpochDay
    val lives = li.flatMap { case (ok, su) =>
      val ou = o(ok)
      if (su < ou) None // dq guard: shipped before ordered
      else if (su <= mxU) Some((day(su) - day(ou), true))
      else Some((day(mxU) - day(ou), false))
    }
    val byD = lives.groupBy(_._1)
    val atRisk = byD.map { case (d, _) => d -> lives.count(_._1 >= d).toLong }
    val got = StatsOps.survivalCurve(spark, sfTies).collect()
      .map(r => r.getAs[Long]("d") -> r).toMap
    assert(got.keySet == byD.keySet)
    for ((d, grp) <- byD) {
      val events = grp.count(_._2).toLong
      val censored = grp.count(!_._2).toLong
      val row = got(d)
      assert(row.getAs[Long]("n_events") == events, s"d=$d")
      assert(row.getAs[Long]("n_censored") == censored, s"d=$d")
      assert(row.getAs[Long]("n_at_risk") == atRisk(d), s"d=$d")
      assert(row.getAs[Double]("hazard") ==
        events.toDouble / atRisk(d).toDouble, s"d=$d")
    }
    // administrative censoring must be non-vacuous alongside real events
    assert(lives.exists(_._2) && lives.exists(!_._2),
      "fixture: need both shipped and censored items")
  }

  test("centroid_confusion: metrics match a straight-line nearest-centroid replay") {
    val rows = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "label", "transform(embedding, x -> cast(x as double)) AS v")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getAs[scala.collection.Seq[Double]]("v").toArray))
    val dims = rows.head._3.length
    // exact floor-quantized per-(label, dim) centroid means
    val cents = rows.groupBy(_._2).map { case (lbl, grp) =>
      lbl -> Array.tabulate(dims) { d =>
        val qs = grp.map(r => math.floor(r._3(d) * 1e6).toLong)
        qs.sum.toDouble / qs.length / 1e6
      }
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def nrm(a: Array[Double]): Double = math.sqrt(dot(a, a))
    val preds = rows.map { case (_, lbl, v) =>
      val best = cents.toSeq.map { case (c, cv) =>
        (dot(v, cv) / (nrm(v) * nrm(cv)), c)
      }.minBy { case (cos, c) => (-cos, c) }._2
      (lbl, best)
    }
    val labels = preds.map(_._1).distinct
    val got = SimilarityOps.centroidConfusion(spark, sf).collect()
      .map(r => r.getAs[Int]("label") -> r).toMap
    assert(got.keySet == labels.toSet)
    for (lbl <- labels) {
      val nTrue = preds.count(_._1 == lbl).toLong
      val nPred = preds.count(_._2 == lbl).toLong
      val tp = preds.count(p => p._1 == lbl && p._2 == lbl).toLong
      val row = got(lbl)
      assert(row.getAs[Long]("n_true") == nTrue, s"label $lbl")
      assert(row.getAs[Long]("n_pred") == nPred, s"label $lbl")
      assert(row.getAs[Long]("tp") == tp, s"label $lbl")
      if (nPred > 0)
        assert(row.getAs[Double]("prec") == tp.toDouble / nPred.toDouble)
      assert(row.getAs[Double]("recall") == tp.toDouble / nTrue.toDouble)
      assert(row.getAs[Double]("f1") == 2.0 * tp.toDouble / (nTrue + nPred).toDouble)
    }
    // the classifier must be non-trivial: some confusion, some hits
    assert(preds.exists(p => p._1 == p._2) && preds.exists(p => p._1 != p._2),
      "fixture: classifier is degenerate (all right or all wrong)")
  }
}
