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
}
