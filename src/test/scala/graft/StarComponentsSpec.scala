package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.DedupOps

/** Large-star/small-star connected components vs the min-label propagation
  * reference: identical labels on every graph shape, and the round count
  * that motivates the variant — O(log d) star rounds against O(d)
  * propagation rounds on a long chain.
  */
class StarComponentsSpec extends SparkSuite {

  import spark.implicits._

  private def nodesDf(ids: Seq[Long]): DataFrame = ids.toDF("doc_id")
  private def pairsDf(ps: Seq[(Long, Long)]): DataFrame =
    ps.toDF("doc_a", "doc_b")

  private def labelsOf(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** ground truth: union-find min-labels */
  private def truth(ids: Seq[Long], ps: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    ps.foreach { case (a, b) => parent(find(a)) = find(b) }
    val byRoot = ids.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val m = members.min; members.map(_ -> m)
    }
  }

  test("64-node chain: star labels equal propagation labels in far fewer rounds") {
    val n = 64L
    val ids = (0L until n)
    val chain = (0L until n - 1).map(i => (i, i + 1))
    val (starLabels, starRounds) =
      DedupOps.starComponents(spark, nodesDf(ids), pairsDf(chain))
    val (propLabels, propRounds) =
      DedupOps.minLabelComponents(spark, nodesDf(ids), pairsDf(chain))
    val expected = ids.map(_ -> 0L).toMap
    assert(labelsOf(starLabels) === expected)
    assert(labelsOf(propLabels) === expected)
    // propagation moves the min ONE hop per round (diameter rounds);
    // alternating stars contract the chain geometrically
    assert(propRounds >= (n - 1).toInt / 2,
      s"propagation finished in $propRounds rounds — chain fixture broken?")
    assert(starRounds * 4 <= propRounds,
      s"star=$starRounds rounds vs propagation=$propRounds — expected ≥4x fewer")
    info(s"star: $starRounds rounds, propagation: $propRounds rounds")
  }

  test("isolated nodes, self-contained cliques and empty edge sets label correctly") {
    val ids = Seq(1L, 2L, 3L, 10L, 11L, 12L, 99L)
    val ps = Seq((2L, 1L), (3L, 2L), (10L, 11L), (11L, 12L), (10L, 12L))
    val (star, _) = DedupOps.starComponents(spark, nodesDf(ids), pairsDf(ps))
    assert(labelsOf(star) === truth(ids, ps))
    val (empty, rounds) =
      DedupOps.starComponents(spark, nodesDf(ids), pairsDf(Seq.empty))
    assert(labelsOf(empty) === ids.map(i => i -> i).toMap)
    assert(rounds === 0)
  }

  test("randomized graphs: star labels equal union-find truth and propagation labels") {
    val rnd = new Random(20260813L)
    (1 to 5).foreach { trial =>
      val n = 40 + rnd.nextInt(40)
      val ids = (0 until n).map(_ => rnd.nextLong(1000000L)).distinct
      val ps = (0 until n).flatMap { _ =>
        val a = ids(rnd.nextInt(ids.size)); val b = ids(rnd.nextInt(ids.size))
        if (a == b) None else Some((a, b))
      }
      val (star, _) = DedupOps.starComponents(spark, nodesDf(ids), pairsDf(ps))
      val (prop, _) = DedupOps.minLabelComponents(spark, nodesDf(ids), pairsDf(ps))
      val want = truth(ids, ps)
      assert(labelsOf(star) === want, s"trial $trial star diverged")
      assert(labelsOf(prop) === want, s"trial $trial propagation diverged")
    }
  }

  test("community_labels equals a single-threaded synchronous-LPA replay at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    // brute edges: distinct same-order part pairs
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).values
    val edges = byOrder.flatMap { rows =>
      val pks = rows.map(_._2).distinct.sorted
      for (i <- pks.indices; j <- (i + 1) until pks.size) yield (pks(i), pks(j))
    }.toSet
    val nbrs = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2) }
    var lab: Map[Long, Long] = nbrs.keys.map(u => u -> u).toMap
    for (_ <- 1 to 3) {
      lab = nbrs.map { case (u, vs) =>
        val counts = vs.map(lab).groupBy(identity).map { case (l, o) => (l, o.size) }
        // argmax count desc, label asc — the engine's window tiebreak
        u -> counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    val sizes = lab.values.groupBy(identity).map { case (l, o) => (l, o.size.toLong) }
    val got = SparkEntry.queries("community_labels")(spark, sf).collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("community"), r.getAs[Long]("community_size"))).toMap
    assert(got.keySet == lab.keySet)
    for ((u, l) <- lab) assert(got(u) == ((l, sizes(l))), s"node $u")
  }

  test("community_labels separates planted cliques (two orders, disjoint parts)") {
    import spark.implicits._
    // two 4-cliques: every part in an order co-purchases every other.
    // Hand-derived LPA: round 1 each node adopts the min of its three
    // NEIGHBOR labels (own label is not a candidate), round 2 the true
    // min floods, round 3 stable -> community = min part id per clique.
    val dir = java.nio.file.Files.createTempDirectory("graft_lpa").toString
    val rows = (for (p <- 1L to 4L) yield (100L, p)) ++
      (for (p <- 11L to 14L) yield (200L, p))
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.ops.StatsOps.communityLabels(spark, dir).collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("community"), r.getAs[Long]("community_size"))).toMap
    val expected =
      (1L to 4L).map(p => p -> ((1L, 4L))).toMap ++
        (11L to 14L).map(p => p -> ((11L, 4L))).toMap
    assert(got == expected, s"got $got")
  }
}
