package graft

/** Ground truth for the r16 monitoring/journey pair: the CUSUM closed
  * form (prefix sum minus running min) must equal the TEXTBOOK recursion
  * S_t = max(0, S_{t−1} + dev_t) — the identity the op's design rests
  * on — replayed straight-line per event type; and top_paths must equal
  * a driver-side first-k journey count with real path collisions.
  */
class CusumPathsSpec extends SparkSuite {

  private val sf01 = "/root/testdata/sf0.01"

  test("cusum closed form == textbook recursion; both alarm branches fire at the gate SF") {
    val rows = SparkEntry.queries("cusum_changepoint")(spark, sf01).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day"),
        r.getAs[Long]("n_events"), r.getAs[Long]("dev_scaled"),
        r.getAs[Long]("cusum_scaled"), r.getAs[Boolean]("alarm")))
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_._1)
    var alarms = 0; var quiets = 0
    byType.foreach { case (et, rs) =>
      val ordered = rs.sortBy(_._2)
      val nd = ordered.length.toLong
      val tot = ordered.map(_._3).sum
      // textbook one-sided CUSUM over the SAME n_days-scaled deviations
      var s = 0L
      ordered.foreach { case (_, day, x, dev, cus, alarm) =>
        assert(dev == nd * x - tot, s"$et $day dev")
        s = math.max(0L, s + dev)
        assert(cus == s, s"$et $day: closed form $cus != recursion $s")
        val wantAlarm = cus * graft.ops.StatsOps.CusumThresholdDen >
          tot * graft.ops.StatsOps.CusumThresholdNum
        assert(alarm == wantAlarm, s"$et $day alarm")
        if (alarm) alarms += 1 else quiets += 1
      }
      // deviations sum to zero by construction (mean removed exactly)
      assert(ordered.map(_._4).sum == 0L, s"$et: deviations must sum to 0")
    }
    assert(alarms > 0 && quiets > 0,
      s"both alarm branches must fire at sf0.01 (alarms=$alarms quiets=$quiets)")
  }

  test("top_paths equals a driver-side first-k journey count; collisions are real") {
    val k = graft.ops.StatsOps.TopPathLen
    val paths = graft.model.Tables.events(spark, sf01)
      .selectExpr("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("ts"), r.getAs[Long]("event_id")))
      .groupBy(_._1)
      .map { case (_, evs) =>
        evs.sortBy(e => (e._3.getTime, e._4)).take(k).map(_._2).mkString(">")
      }.toSeq
    val counts = paths.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val want = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
      .zipWithIndex.map { case ((p, n), i) => (p, n, i + 1) }.toSet
    val got = SparkEntry.queries("top_paths")(spark, sf01).collect()
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("n_users"),
        r.getAs[Int]("rk"))).toSet
    assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    // real journey collisions: the top path is shared by >1 user, and the
    // path space is genuinely diverse (not one degenerate path)
    assert(got.exists(_._2 > 1L), "no shared journeys — TopPathLen too long for fixture")
    assert(counts.size > 20, "path space collapsed — top-20 cut vacuous")
  }
}
