package graft

import graft.ops.StatsOps

/** Ground truth for the Mann–Whitney op: a straight-line textbook
  * computation — sort the combined sample, tie-averaged ranks as
  * rationals, U from the rank sum, tie-corrected normal z — over the
  * collected fixture, compared exactly (the engine's arithmetic is
  * integer to the same boundary, so doubles must match bit-for-bit).
  */
class MannWhitneySpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01" // sf0.001 has no tied cents values — the tie path would be vacuous

  test("u/z/rank-biserial match a straight-line textbook computation") {
    val rows = graft.model.Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .selectExpr("CAST(value AS DECIMAL(18,2)) AS v", "user_id % 2 AS arm")
      .collect()
      .map(r => (r.getDecimal(0), r.getLong(1)))
    val sorted = rows.sortBy(_._1)
    // tie-averaged ranks, 2x-scaled so everything stays integer
    val byV = sorted.zipWithIndex.groupBy(_._1._1)
    var r2a = BigInt(0) // 2x-scaled rank sum of arm 0
    var ties = BigInt(0)
    for ((_, grp) <- byV) {
      val idxs = grp.map(_._2)
      val t = BigInt(idxs.length)
      // 2x-scaled average rank of the group (ranks are 1-based indices)
      val r2 = BigInt(idxs.min + 1 + idxs.max + 1)
      r2a += r2 * grp.count(_._1._2 == 0L)
      ties += t * t * t - t
    }
    val na = rows.count(_._2 == 0L)
    val nb = rows.count(_._2 == 1L)
    val u2 = r2a - BigInt(na) * BigInt(na + 1)
    val uA = u2.toDouble / 2.0
    val naD = na.toDouble; val nbD = nb.toDouble; val nD = naD + nbD
    val sigma = math.sqrt(naD * nbD / 12.0 *
      ((nD + 1.0) - ties.toDouble / (nD * (nD - 1.0))))
    val z = (uA - naD * nbD / 2.0) / sigma
    val rbc = 1.0 - 2.0 * uA / (naD * nbD)

    val got = StatsOps.mannWhitneyU(spark, sf).collect()(0)
    assert(got.getAs[Long]("n_a") == na && got.getAs[Long]("n_b") == nb)
    assert(got.getAs[Double]("u_a") == uA)
    assert(got.getAs[Double]("z") == z)
    assert(got.getAs[Double]("rank_biserial") == rbc)
    // the fixture must actually contain ties or the correction is vacuous
    assert(byV.exists(_._2.length > 1), "no tied values — tie path vacuous")
  }
}
