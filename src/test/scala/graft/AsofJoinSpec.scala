package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.plans.AsofJoinOps

/** Specs for the native as-of join operator (custom LogicalPlan + Rule +
  * Strategy + SparkPlan): hand-computed semantics incl. boundary/no-match/
  * null cases, agreement with the union+window emulation on real data,
  * the physical plan shape, and predicate pushdown through the custom node.
  */
class AsofJoinSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("as-of semantics: latest prior-or-equal match, inclusive boundary, nulls on no match") {
    import spark.implicits._
    val quotes = Seq(
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)
    ).map { case (s, t, p) => (s, ts(t), p) }.toDF("sym", "qts", "price")
    val trades = Seq(
      ("A", 5L),  // before any quote -> null
      ("A", 20L), // equal timestamp  -> inclusive, 2.0
      ("A", 25L), // between          -> 2.0
      ("A", 99L), // after all        -> 3.0
      ("B", 14L), // before B's quote -> null
      ("C", 50L)  // key with no quotes -> null
    ).map { case (s, t) => (s, ts(t)) }.toDF("sym", "tts")
    val got = AsofJoinOps.asofJoin(trades, quotes, Seq("sym"), "tts", "qts")
      .select(col("sym"), col("tts"), col("price_r"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000,
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSet
    assert(got == Set(
      ("A", 5L, None), ("A", 20L, Some(2.0)), ("A", 25L, Some(2.0)),
      ("A", 99L, Some(3.0)), ("B", 14L, None), ("C", 50L, None)))
  }

  test("null keys and null times never match; null-key left rows survive null-padded") {
    import spark.implicits._
    val right = Seq(
      (Option("A"), Option(10L), 1.0),
      (Option.empty[String], Option(5L), 8.0), // null key: never matches
      (Option("A"), Option.empty[Long], 9.0)   // null time: never matches
    ).map { case (s, t, p) => (s, t.map(ts), p) }.toDF("k", "rt", "v")
    val left = Seq(
      (Option("A"), Option(20L)),
      (Option.empty[String], Option(20L)), // null key left row -> padded
      (Option("A"), Option.empty[Long])    // null time left row -> padded
    ).map { case (s, t) => (s, t.map(ts)) }.toDF("k", "lt")
    val got = AsofJoinOps.asofJoin(left, right, Seq("k"), "lt", "rt")
      .select(col("k"), col("v_r")).collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
    assert(got == Set(("A", Some(1.0)), (null, None), ("A", None)))
  }

  test("asof_join_price equals the union+window emulation (asof_price) on real data") {
    val viaJoin = SparkEntry.queries("asof_join_price")(spark, sf).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val viaWindow = SparkEntry.queries("asof_price")(spark, sf).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(viaJoin == viaWindow)
    assert(viaJoin.nonEmpty)
  }

  test("key/time type mismatches are rejected up front, not silently corrupted") {
    import spark.implicits._
    val left = Seq((1, ts(10))).toDF("k", "lt")             // k: int
    val right = Seq((1L, ts(5), 1.0)).toDF("k", "rt", "v")  // k: long
    val e1 = intercept[IllegalArgumentException] {
      AsofJoinOps.asofJoin(left, right, Seq("k"), "lt", "rt")
    }
    assert(e1.getMessage.contains("key type mismatch"), e1.getMessage)
    val right2 = Seq((1, java.sql.Date.valueOf("2024-01-01"), 1.0)).toDF("k", "rt", "v")
    val e2 = intercept[IllegalArgumentException] {
      AsofJoinOps.asofJoin(left, right2, Seq("k"), "lt", "rt") // timestamp vs date
    }
    assert(e2.getMessage.contains("time type mismatch"), e2.getMessage)
  }

  test("randomized: merge pass equals brute force over many keys/partitions") {
    import spark.implicits._
    // Adversarial shapes for the handwritten merge: many keys per
    // partition, duplicate left times, left times before/after all right
    // times, keys on only one side. Right (key, time) pairs are unique so
    // the expected match is well-defined.
    val rnd = new scala.util.Random(47)
    val rightRows = rnd.shuffle(
      (for { k <- 0 until 40; t <- 0 until 200 if rnd.nextDouble() < 0.15 }
        yield (s"k$k", ts(t.toLong), k * 1000 + t)).toList)
    val leftRows = List.fill(3000) {
      val k = rnd.nextInt(50) // keys 40-49 have no right rows
      (s"k$k", ts(rnd.nextInt(220).toLong), rnd.nextLong())
    }
    val right = rightRows.toDF("k", "rt", "rv").repartition(7)
    val left = leftRows.toDF("k", "lt", "lid").repartition(5)
    val got = AsofJoinOps.asofJoin(left, right, Seq("k"), "lt", "rt")
      .select(col("lid"), col("rv_r")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toList.sorted).toMap
    val byKey = rightRows.groupBy(_._1)
    val expected = leftRows
      .map { case (k, t, id) =>
        val m = byKey.getOrElse(k, Nil).filter(!_._2.after(t))
          .sortBy(_._2.getTime).lastOption.map(_._3)
        (id, m)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(got == expected)
  }

  test("ScalaCheck property: merge equals brute force under skew, nulls and partition boundaries") {
    import spark.implicits._
    import org.scalacheck.Gen
    // The handwritten merge (AsofJoinExec's lookahead scan) is the one
    // place a silent off-by-one could hide, so drive it with ScalaCheck-
    // generated adversarial datasets: skewed keys (80% of rows on one
    // key), null keys, null times, duplicate left times, right-empty
    // keys, and times colliding at every boundary of a tiny domain. All
    // generated cases are unioned under a case-id and as-of joined on the
    // COMPOSITE (cid, k) key in ONE distributed pass — per-case isolation
    // is exactly key isolation, and two forced shuffle-partition settings
    // move the partition boundaries between passes.
    val keyGen: Gen[Option[Int]] = Gen.frequency(
      8 -> Gen.const(Some(0)), // skew: most rows on one key
      3 -> Gen.choose(0, 3).map(Some(_)),
      1 -> Gen.const(None))
    val timeGen: Gen[Option[Long]] = Gen.frequency(
      9 -> Gen.choose(0L, 20L).map(Some(_)), // tiny domain: constant ties
      1 -> Gen.const(None))
    val caseGen: Gen[(List[(Option[Int], Option[Long])], List[(Option[Int], Option[Long])])] =
      for {
        nr <- Gen.choose(0, 15)
        right <- Gen.listOfN(nr, Gen.zip(keyGen, timeGen))
        nl <- Gen.choose(1, 25)
        left <- Gen.listOfN(nl, Gen.zip(keyGen, timeGen))
      } yield (right.distinct, left) // unique right (k,t) -> determinate match
    val nCases = 220
    val cases = (0 until nCases).map { cid =>
      // deterministic ScalaCheck sampling: one seed per case id
      val params = Gen.Parameters.default
      val seed = org.scalacheck.rng.Seed(0xA50FL * (cid + 1))
      cid -> caseGen.apply(params, seed).getOrElse(sys.error(s"gen failed for $cid"))
    }
    var rv = 0L
    val rightRows = cases.flatMap { case (cid, (right, _)) =>
      right.map { case (k, t) => rv += 1; (cid, k, t, rv) }
    }
    var lid = 0L
    val leftRows = cases.flatMap { case (cid, (_, left)) =>
      left.map { case (k, t) => lid += 1; (cid, k, t, lid) }
    }
    // brute force: latest non-null right time <= left time on the same
    // (cid, key); null key or time on either side never matches
    val byKey = rightRows.groupBy(r => (r._1, r._2))
    val expected = leftRows.map { case (cid, k, t, id) =>
      val m = (k, t) match {
        case (Some(_), Some(lt)) =>
          byKey.getOrElse((cid, k), Nil)
            .collect { case (_, _, Some(rt), v) if rt <= lt => (rt, v) }
            .sortBy(_._1).lastOption.map(_._2)
        case _ => None
      }
      id -> m
    }.toMap
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try Seq("2", "5").foreach { parts =>
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val got = AsofJoinOps.asofJoin(
          leftRows.toDF("cid", "k", "lt", "lid"),
          rightRows.toDF("cid", "k", "rt", "rv"),
          Seq("cid", "k"), "lt", "rt")
        .select(col("lid"), col("rv_r")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      assert(got == expected,
        s"parts=$parts: ${(expected.toSet -- got.toSet).take(3)} expected-only; " +
          s"${(got.toSet -- expected.toSet).take(3)} got-only")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    info(s"$nCases generated cases (${leftRows.size} left rows) match brute force under 2 layouts")
  }

  test("plans as AsofJoinExec: two clustered sorts, one merge, no cross product") {
    val df = SparkEntry.queries("asof_join_price")(spark, sf)
    df.count()
    // AdaptiveSparkPlanExec does not expose its inner plan as children, so
    // match the rendered tree rather than traversing
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("AsofJoin "), s)
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"), s)
    // both inputs clustered+sorted on (key, time) feeding the merge
    assert("Sort \\[user_id[^\\]]*ts".r.findAllIn(s).length == 2, s)
  }

  test("unused columns prune through the custom node to both scans (our Rule)") {
    val ev = graft.model.Tables.events(spark, sf) // 6 columns incl. props
    val joined = AsofJoinOps.asofJoin(
        ev.filter(col("event_type") === "signup"),
        ev.filter(col("event_type") === "purchase"),
        Seq("user_id"), "ts", "ts")
      .select(col("event_id"), col("value_r")) // uses 2 of 12 output columns
    joined.count()
    val s = joined.queryExecution.executedPlan.toString
    val reads = "ReadSchema: struct<[^>]*>".r.findAllIn(s).toList
    assert(reads.size == 2, s)
    // props is used by NOTHING and must be pruned from both scans
    reads.foreach { r =>
      assert(!r.contains("props"), s"props must be pruned from scan: $r\n$s")
    }
    // value is needed only on the RIGHT (as value_r): the left scan must
    // not read it — this is the assertion that fails if the rule regresses
    assert(reads.exists(!_.contains("value")), s"left scan must prune value:\n$s")
  }

  test("left-side filters push through the custom node to the scan (our Rule)") {
    val df = SparkEntry.queries("asof_join_price")(spark, sf)
      .filter(col("user_id") < 100)
    df.count()
    val optimized = df.queryExecution.optimizedPlan
    // without PushFilterThroughAsofJoin the Filter stalls ABOVE AsofJoin
    val aj = optimized.collectFirst { case j: graft.plans.AsofJoin => j }.get
    assert(aj.left.toString.contains("user_id"), s"filter not pushed into left:\n$optimized")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.matches("(?s).*PushedFilters: \\[[^\\]]*LessThan\\(user_id,100\\)[^\\]]*\\].*"),
      s"predicate must reach the parquet scan:\n$scan")
  }
}
