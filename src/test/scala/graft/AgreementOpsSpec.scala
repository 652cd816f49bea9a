package graft

/** Driver-side ground-truth replays for the r14 batch — fleiss_kappa,
  * ece_eval, shard_manifest — each recomputed single-threaded from the
  * raw parquet with independent arithmetic (BigInt clearing, MessageDigest
  * md5), plus the non-vacuity guards: every rater category occupied, both
  * full-agreement and disagreement items present, a strictly positive
  * calibration gap, every shard populated.
  */
class AgreementOpsSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def toks(text: String): Array[String] =
    SparkSuite.sqlTrim(text).split(" ", -1)

  test("fleiss_kappa equals the BigInt-cleared replay; raters genuinely disagree") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("n_chars", "text").collect()
      .map(r => (r.getAs[Long]("n_chars"), r.getString(1)))
    val ratings = docs.map { case (nc, text) =>
      val nt = toks(text).length.toLong
      val nd = toks(text).distinct.length.toLong
      val ra = if (nc < 216) 0 else if (nc < 380) 1 else 2
      val rb = if (nt < 39) 0 else if (nt < 69) 1 else 2
      val rc = if (nd * 100 < nt * 40) 0 else if (nd * 100 < nt * 55) 1 else 2
      (ra, rb, rc)
    }
    // non-vacuity: all categories used; agreement AND disagreement exist
    assert((0 to 2).forall(c => ratings.exists(r => r._1 == c || r._2 == c || r._3 == c)))
    assert(ratings.exists(r => r._1 == r._2 && r._2 == r._3), "no unanimous item")
    assert(ratings.exists(r => r._1 != r._2 || r._2 != r._3), "no disagreement")
    val n = BigInt(ratings.length)
    val s = BigInt(ratings.map { case (a, b, c) =>
      3 + 2 * (Seq(a == b, a == c, b == c).count(identity))
    }.sum)
    val t = (0 to 2).map(j => BigInt(ratings.map { case (a, b, c) =>
      Seq(a, b, c).count(_ == j)
    }.sum))
    val t2 = t.map(x => x * x).sum
    val num = 3 * n * (s - 3 * n) - 2 * t2
    val den = 18 * n * n - 2 * t2
    val row = SparkEntry.queries("fleiss_kappa")(spark, sf).collect().head
    assert(row.getAs[Long]("n") == n.toLong)
    assert(row.getAs[Long]("s_sum") == s.toLong)
    assert((0 to 2).forall(j => row.getAs[Long](s"t$j") == t(j).toLong))
    assert(row.getAs[Long]("kappa_num") == num.toLong)
    assert(row.getAs[Long]("kappa_den") == den.toLong)
    assert(row.getAs[Double]("kappa") == num.toDouble / den.toDouble)
    // the statistic is meaningful on this fixture: above chance, below 1
    assert(row.getAs[Double]("kappa") > 0.0 && row.getAs[Double]("kappa") < 1.0)
  }

  test("ece_eval equals the integer-gap replay over calibration_bins' own bins") {
    val bins = SparkEntry.queries("calibration_bins")(spark, sf).collect()
      .map(r => (r.getAs[Long]("n"), r.getAs[Long]("n_pos")))
    val events = spark.read.parquet(s"$sf/events.parquet")
    // replay from the raw events with independent binning
    val rows = SparkEntry.queries("ece_eval")(spark, sf).collect()
    assert(rows.length == 1)
    val row = rows.head
    val vcPos = events.selectExpr(
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos")
      .where("vc IS NOT NULL").collect()
      .map(r => (r.getAs[Long]("vc"), r.getAs[Int]("pos").toLong))
    val mxc = vcPos.map(_._1).max
    val byBin = vcPos.groupBy { case (vc, _) => math.min(9L, vc * 10 / mxc) }
    val eceNum = byBin.values.map { g =>
      (BigInt(g.map(_._2).sum) * mxc - BigInt(g.map(_._1).sum)).abs
    }.sum
    assert(row.getAs[Long]("n") == vcPos.length.toLong)
    assert(row.getAs[Long]("mxc") == mxc)
    assert(row.getAs[Long]("n_bins") == byBin.size.toLong)
    assert(row.getAs[Long]("ece_num") == eceNum.toLong)
    assert(row.getAs[Double]("ece") ==
      eceNum.toDouble / (vcPos.length.toDouble * mxc.toDouble))
    assert(row.getAs[Long]("ece_num") > 0, "perfectly calibrated fixture — vacuous")
    // the scalar really is over the published diagram's bins
    assert(bins.map(_._1).sum == row.getAs[Long]("n"))
  }

  test("pass_at_k equals the BigInt falling-factorial replay; estimator strictly interior") {
    val byUser = graft.model.Tables.events(spark, sf)
      .selectExpr("user_id", "event_type").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
      .groupBy(_._1)
      .map { case (u, g) =>
        u -> (g.length.toLong, g.count(_._2 == "purchase").toLong)
      }
      .filter(_._2._1 >= 5)
    def fall(base: Long): BigInt = (0 until 5).map(i => BigInt(base - i)).product
    val got = SparkEntry.queries("pass_at_k")(spark, sf).collect().map { r =>
      r.getAs[Long]("user_id") -> (
        r.getAs[Long]("n_attempts"), r.getAs[Long]("n_success"),
        r.getAs[Long]("fail_num"), r.getAs[Long]("fail_den"),
        r.getAs[Double]("pass_at_k"))
    }.toMap
    assert(got.keySet == byUser.keySet)
    for ((u, (n, c)) <- byUser) {
      val num = if (n - c < 5) BigInt(0) else fall(n - c)
      val den = fall(n)
      assert(got(u) == ((n, c, num.toLong, den.toLong,
        1.0 - num.toDouble / den.toDouble)), s"user $u")
    }
    // the fixture keeps the estimator strictly interior for some users
    // (no degenerate all-pass / all-fail sweep)
    assert(got.values.exists(v => v._5 > 0.0 && v._5 < 1.0))
    assert(got.nonEmpty)
  }

  test("shard_manifest digests equal MessageDigest md5 over the permutation order") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id").collect().map(_.getLong(0))
    val p = 1000000007L
    def pk(id: Long) = Math.floorMod(Math.floorMod(id, p) * 2654435761L, p)
    // the SIZE contract: S derives from the corpus, so the per-shard
    // ordered-id list is bounded by the target regardless of corpus size
    val t = graft.ops.PipelineOps.ShardTargetDocs
    val s = math.max((docs.length + t - 1) / t, 1L)
    assert(s > 1, "fixture must populate several shards (target too big?)")
    val byShard = docs.groupBy(id => pk(id) % s)
    assert(byShard.size == s, s"only ${byShard.size} of $s shards populated")
    val got = SparkEntry.queries("shard_manifest")(spark, sf).collect()
      .map(r => r.getAs[Long]("shard_id") ->
        (r.getAs[Long]("n_docs"), r.getAs[String]("ids_md5"))).toMap
    assert(got.size == s, s"engine produced ${got.size} shards, want $s")
    for ((shard, ids) <- byShard) {
      val ordered = ids.sortBy(id => (pk(id), id)).mkString(",")
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(ordered.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      assert(got(shard) == ((ids.length.toLong, hex)), s"shard $shard")
    }
    // the bound the derived S exists to enforce: no shard's list grows
    // with the corpus — target x a small hash-imbalance factor only
    val maxDocs = got.values.map(_._1).max
    assert(maxDocs <= 2 * t, s"shard of $maxDocs docs exceeds 2x target $t")
  }
}
