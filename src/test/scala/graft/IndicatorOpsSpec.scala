package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{AggOps, IndicatorOps, PipelineOps}

/** Ground-truth specs for the technical-indicator layer: every indicator is
  * recomputed in straight-line Scala from the collected candle series and
  * compared EXACTLY (bit-for-bit doubles — the ops' determinism contract is
  * integer window arithmetic with one final IEEE step, so a plain loop must
  * reproduce them). Independent of both the window-function plans and the
  * DuckDB oracle.
  */
class IndicatorOpsSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  /** symbol -> candles ordered by window_start:
    * (window_start, closeCents, hiCents, loCents, vol).
    */
  private lazy val series: Map[String, Vector[(Timestamp, Long, Long, Long, Long)]] =
    AggOps.ohlcv1min(spark, sf)
      .select(col("symbol"), col("window_start"),
        round(col("close_price") * 100).cast("long"),
        round(col("high_price") * 100).cast("long"),
        round(col("low_price") * 100).cast("long"),
        round(col("total_volume")).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .groupBy(_._1)
      .map { case (s, rows) =>
        s -> rows.sortBy(_._2.getTime).map(t => (t._2, t._3, t._4, t._5, t._6)).toVector
      }

  private def collectD(df: org.apache.spark.sql.DataFrame, c: String) =
    df.collect().map { r =>
      val v: Option[Double] =
        if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getDouble(r.fieldIndex(c)))
      (r.getString(r.fieldIndex("symbol")), r.getTimestamp(r.fieldIndex("window_start"))) -> v
    }.toMap

  test("rsi_14 matches straight-line recomputation exactly") {
    val expected = series.toSeq.flatMap { case (sym, rows) =>
      val xs = rows.map(_._2)
      val diffs = xs.sliding(2).map(p => p(1) - p(0)).toVector
      (13 until diffs.length).map { j =>
        val win = diffs.slice(j - 13, j + 1)
        val g = win.map(d => math.max(d, 0L)).sum
        val l = win.map(d => math.max(-d, 0L)).sum
        val rsi = if (g + l == 0L) None else Some(g.toDouble * 100.0 / (g + l).toDouble)
        (sym, rows(j + 1)._1) -> rsi
      }
    }.toMap
    val actual = collectD(IndicatorOps.rsi14(spark, sf), "rsi")
    assert(actual.size === expected.size)
    expected.foreach { case (k, v) => assert(actual(k) === v, k) }
  }

  test("bollinger_bands matches straight-line recomputation exactly") {
    val expected = series.toSeq.flatMap { case (sym, rows) =>
      val xs = rows.map(_._2)
      (19 until xs.length).map { i =>
        val win = xs.slice(i - 19, i + 1)
        val s1 = win.sum; val s2 = win.map(x => x * x).sum
        val mid = s1.toDouble / 20.0 / 100.0
        val sd = math.sqrt((s2 * 20L - s1 * s1).toDouble / 380.0)
        (sym, rows(i)._1) -> (mid, mid + 2.0 * sd / 100.0, mid - 2.0 * sd / 100.0)
      }
    }.toMap
    val actual = IndicatorOps.bollingerBands(spark, sf).collect().map { r =>
      (r.getString(0), r.getTimestamp(1)) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    }.toMap
    assert(actual.size === expected.size)
    expected.foreach { case (k, v) => assert(actual(k) === v, k) }
  }

  test("stoch_osc matches straight-line recomputation exactly") {
    val expected = series.toSeq.flatMap { case (sym, rows) =>
      (13 until rows.length).map { i =>
        val win = rows.slice(i - 13, i + 1)
        val hi = win.map(_._3).max; val lo = win.map(_._4).min
        val x = rows(i)._2
        val k = if (hi == lo) None
                else Some(((x - lo) * 100L).toDouble / (hi - lo).toDouble)
        (sym, rows(i)._1) -> k
      }
    }.toMap
    val actual = collectD(IndicatorOps.stochOsc(spark, sf), "stoch_k")
    assert(actual.size === expected.size)
    expected.foreach { case (k, v) => assert(actual(k) === v, k) }
  }

  test("obv matches straight-line recomputation exactly") {
    val expected = series.toSeq.flatMap { case (sym, rows) =>
      var acc = 0L
      rows.indices.map { i =>
        val signed =
          if (i == 0) 0L
          else {
            val d = rows(i)._2 - rows(i - 1)._2
            if (d > 0) rows(i)._5 else if (d < 0) -rows(i)._5 else 0L
          }
        acc += signed
        (sym, rows(i)._1) -> acc
      }
    }.toMap
    val actual = IndicatorOps.obv(spark, sf).collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) -> r.getLong(2)).toMap
    assert(actual.size === expected.size)
    expected.foreach { case (k, v) => assert(actual(k) === v, k) }
  }

  test("ewma_price matches straight-line recomputation exactly") {
    val expected = series.toSeq.flatMap { case (sym, rows) =>
      val xs = rows.map(_._2)
      (15 until xs.length).map { i =>
        val num = (0 until 16).map(k => xs(i - k) * (1L << (15 - k))).sum
        (sym, rows(i)._1) -> (num.toDouble / 65535.0 / 100.0)
      }
    }.toMap
    val actual = IndicatorOps.ewmaPrice(spark, sf).collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) -> r.getDouble(2)).toMap
    assert(actual.size === expected.size)
    expected.foreach { case (k, v) => assert(actual(k) === v, k) }
  }

  test("atr_14 matches straight-line recomputation exactly") {
    val expected = series.toSeq.flatMap { case (sym, rows) =>
      val trs = (1 until rows.length).map { i =>
        val (_, _, hi, lo, _) = rows(i)
        val pc = rows(i - 1)._2
        math.max(hi - lo, math.max(math.abs(hi - pc), math.abs(lo - pc)))
      }
      (13 until trs.length).map { j =>
        val s = trs.slice(j - 13, j + 1).sum
        (sym, rows(j + 1)._1) -> (s.toDouble / 14.0 / 100.0)
      }
    }.toMap
    val actual = IndicatorOps.atr14(spark, sf).collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) -> r.getDouble(2)).toMap
    assert(actual.size === expected.size)
    expected.foreach { case (k, v) => assert(actual(k) === v, k) }
  }

  test("mfi_14 matches straight-line recomputation exactly") {
    val expected = series.toSeq.flatMap { case (sym, rows) =>
      val flows = (1 until rows.length).map { i =>
        val tp3 = rows(i)._3 + rows(i)._4 + rows(i)._2
        val prev = rows(i - 1)._3 + rows(i - 1)._4 + rows(i - 1)._2
        val mf = tp3 * rows(i)._5
        (if (tp3 > prev) mf else 0L, if (tp3 < prev) mf else 0L)
      }
      (13 until flows.length).map { j =>
        val win = flows.slice(j - 13, j + 1)
        val p = win.map(_._1).sum; val n = win.map(_._2).sum
        val mfi = if (p + n == 0L) None else Some(p.toDouble * 100.0 / (p + n).toDouble)
        (sym, rows(j + 1)._1) -> mfi
      }
    }.toMap
    val actual = collectD(IndicatorOps.mfi14(spark, sf), "mfi")
    assert(actual.size === expected.size)
    expected.foreach { case (k, v) => assert(actual(k) === v, k) }
  }

  test("pairwise_corr matches straight-line recomputation exactly") {
    val syms = series.keys.toSeq.sorted
    val expected = (for {
      i <- syms.indices; j <- (i + 1) until syms.length
      // a pair with no common minute produces no joined rows at all
      if series(syms(i)).map(_._1.getTime).toSet
        .intersect(series(syms(j)).map(_._1.getTime).toSet).nonEmpty
    } yield {
      val a = series(syms(i)).map(t => t._1.getTime -> t._2).toMap
      val b = series(syms(j)).map(t => t._1.getTime -> t._2).toMap
      val common = a.keySet.intersect(b.keySet).toSeq
      val xs = common.map(a); val ys = common.map(b)
      val n = BigInt(common.size)
      val sx = xs.map(BigInt(_)).sum; val sy = ys.map(BigInt(_)).sum
      val sxy = common.map(k => BigInt(a(k)) * BigInt(b(k))).sum
      val sxx = xs.map(x => BigInt(x) * BigInt(x)).sum
      val syy = ys.map(y => BigInt(y) * BigInt(y)).sum
      val corr =
        if (n * sxx - sx * sx == 0 || n * syy - sy * sy == 0) None
        else Some((n * sxy - sx * sy).toDouble /
          (math.sqrt((n * sxx - sx * sx).toDouble) * math.sqrt((n * syy - sy * sy).toDouble)))
      (syms(i), syms(j)) -> ((common.size.toLong, corr))
    }).toMap
    val actual = IndicatorOps.pairwiseCorr(spark, sf).collect()
      .map { r =>
        val c: Option[Double] = if (r.isNullAt(3)) None else Some(r.getDouble(3))
        (r.getString(0), r.getString(1)) -> ((r.getLong(2), c))
      }.toMap
    assert(actual.size === expected.size)
    expected.foreach { case (k, v) => assert(actual(k) === v, k) }
  }

  test("zscore_anomaly matches straight-line recomputation exactly") {
    val expected = series.toSeq.flatMap { case (sym, rows) =>
      val xs = rows.map(_._2)
      val n = xs.size.toDouble
      val sx = xs.sum.toDouble
      val sxx = xs.map(x => x * x).sum.toDouble
      val mean = sx / n
      val sd = math.sqrt((n * sxx - sx * sx) / (n * (n - 1.0)))
      if (xs.size <= 1 || n * sxx - sx * sx == 0.0) Seq.empty
      else rows.collect {
        case (t, x, _, _, _) if math.abs((x.toDouble - mean) / sd) > 3.0 =>
          (sym, t) -> ((x.toDouble / 100.0, (x.toDouble - mean) / sd))
      }
    }.toMap
    val actual = IndicatorOps.zscoreAnomaly(spark, sf).collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(actual.size === expected.size)
    expected.foreach { case (k, v) => assert(actual(k) === v, k) }
  }

  test("rsi and stoch_k stay in [0, 100]; bands bracket the sma") {
    IndicatorOps.rsi14(spark, sf).collect().foreach { r =>
      if (!r.isNullAt(2)) assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 100.0)
    }
    IndicatorOps.stochOsc(spark, sf).collect().foreach { r =>
      if (!r.isNullAt(2)) assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 100.0)
    }
    IndicatorOps.bollingerBands(spark, sf).collect().foreach { r =>
      assert(r.getDouble(3) >= r.getDouble(2) && r.getDouble(2) >= r.getDouble(4))
    }
  }

  test("ts_pattern_search matches straight-line recomputation exactly") {
    val K = 8
    val q = (0 until K).map(i => (i - 3.5) / math.sqrt(5.25))
    val all = series.toSeq.flatMap { case (sym, rows) =>
      rows.sliding(K).filter(_.size == K).flatMap { w =>
        val xs = w.map(_._2)
        val s1 = xs.sum; val s2 = xs.map(x => x * x).sum
        if (s2 * K - s1 * s1 == 0L) None
        else {
          val m = s1.toDouble / 8.0
          val sd = math.sqrt((s2.toDouble * 8.0 - s1.toDouble * s1.toDouble) / 64.0)
          // left-assoc sum, mirroring the engine's reduce(_ + _)
          val dist = (0 until K).map { i =>
            val z = (xs(i).toDouble - m) / sd - q(i)
            z * z
          }.reduce(_ + _)
          Some((dist, sym, w.last._1))
        }
      }
    }
    val expected = all.sortBy(t => (t._1, t._2, t._3.getTime)).take(20)
      .map(t => (t._2, t._3) -> t._1).toMap
    val actual = IndicatorOps.tsPatternSearch(spark, sf).collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) -> r.getDouble(2)).toMap
    assert(actual.size === expected.size)
    expected.foreach { case (k, v) => assert(actual(k) === v, k) }
  }

  test("ohlcv_5min_rollup matches straight-line recomputation from raw events") {
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("ts"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long"),
        get_json_object(col("props"), "$.k").cast("decimal(18,0)").cast("long"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
    def us(t: java.sql.Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    // floorDiv, not /: the engine buckets via window()/date_trunc (floor
    // semantics), and truncating division would diverge pre-epoch
    val minutes = ev.groupBy { case (t, sym, _, _) => (Math.floorDiv(us(t), 60000000L), sym) }
      .map { case ((m, sym), rows) =>
        val sorted = rows.sortBy(r => us(r._1))
        (m, sym,
          sorted.head._3, rows.map(_._3).max, rows.map(_._3).min, sorted.last._3,
          rows.map(_._4).sum, rows.map(r => r._3 * r._4).sum)
      }
    val expected = minutes.groupBy { case (m, sym, _, _, _, _, _, _) => (Math.floorDiv(m, 5L), sym) }
      .map { case ((b5, sym), rows) =>
        val sorted = rows.toSeq.sortBy(_._1)
        val vol = rows.map(_._7).sum; val tv = rows.map(_._8).sum
        val ws = new java.sql.Timestamp(b5 * 300000L)
        (ws, sym) -> ((
          sorted.head._3.toDouble / 100.0, rows.map(_._4).max.toDouble / 100.0,
          rows.map(_._5).min.toDouble / 100.0, sorted.last._6.toDouble / 100.0,
          vol, rows.size.toLong,
          if (vol == 0L) None else Some(tv.toDouble / vol.toDouble / 100.0)))
      }
    val actual = graft.ops.AggOps.ohlcv5minRollup(spark, sf).collect().map { r =>
      val vwap: Option[Double] = if (r.isNullAt(8)) None else Some(r.getDouble(8))
      // window_end (appended last) is the start + 5 minutes, timestamp-typed
      assert(r.getTimestamp(9).getTime === r.getTimestamp(0).getTime + 300000L)
      (r.getTimestamp(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6), r.getLong(7), vwap))
    }.toMap
    assert(actual.size === expected.size)
    expected.foreach { case (k, v) => assert(actual(k) === v, k) }
  }

  test("doc_chunks matches straight-line chunking exactly") {
    val docs = graft.model.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = docs.flatMap { case (id, text) =>
      val toks = text.trim.split(" ", -1)
      // the grid stops at the first window reaching the document end
      (0 to math.max(toks.length - 33, 0) by 32).map { s =>
        val chunk = toks.slice(s, math.min(s + 64, toks.length))
        (id, s / 32) -> ((chunk.length, md5hex(chunk.mkString(" "))))
      }
    }.toMap
    val actual = PipelineOps.docChunks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getInt(2), r.getString(3)))).toMap
    assert(actual.size === expected.size)
    expected.foreach { case (k, v) => assert(actual(k) === v, k) }

    // chunk_dedup is the groupBy of the same chunk stream: recompute the
    // duplicated-hash table from the straight-line chunks and compare
    val byHash = expected.toSeq
      .map { case ((id, _), (_, h)) => h -> id }
      .groupBy(_._1)
      .collect { case (h, occ) if occ.size > 1 =>
        h -> ((occ.size.toLong, occ.map(_._2).distinct.size.toLong, occ.map(_._2).min))
      }
    val dedup = PipelineOps.chunkDedup(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(dedup.size === byHash.size)
    byHash.foreach { case (k, v) => assert(dedup(k) === v, k) }
  }
}
