package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.util.GenericArrayData

import graft.ops.CustomOps.VwapAggregator
import graft.ops.MultimodalOps
import graft.functions.{CharNgrams3, CosineSimilarity, DotProduct, MinHashSignature, SignLshBuckets, SimHash64}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String

/** ScalaCheck properties (SURVEY §5): the algebraic laws that make the
  * engine's aggregation and expressions correct under ANY partitioning —
  * partial aggregation is only sound if merge is commutative, associative,
  * and zero-neutral; expressions must agree with their reference math.
  */
object GraftProperties extends Properties("graft") {

  private type Buf = (java.math.BigDecimal, java.math.BigDecimal)
  private def bd(d: BigDecimal) = d.underlying()

  private val genRow: Gen[(String, java.math.BigDecimal, java.math.BigDecimal)] =
    for {
      s <- Gen.oneOf("A", "B", "C")
      p <- Gen.choose(1, 100000).map(n => bd(BigDecimal(n) / 100))
      q <- Gen.choose(0, 1000).map(n => bd(BigDecimal(n)))
    } yield (s, p, q)

  private val genBuf: Gen[Buf] = for {
    pv <- Gen.choose(0L, 1000000L).map(n => bd(BigDecimal(n) / 100))
    v <- Gen.choose(0L, 10000L).map(n => bd(BigDecimal(n)))
  } yield (pv, v)

  property("VwapAggregator.merge is commutative") = forAll(genBuf, genBuf) { (x, y) =>
    VwapAggregator.merge(x, y) == VwapAggregator.merge(y, x)
  }

  property("VwapAggregator.merge is associative") =
    forAll(genBuf, genBuf, genBuf) { (x, y, z) =>
      VwapAggregator.merge(VwapAggregator.merge(x, y), z) ==
        VwapAggregator.merge(x, VwapAggregator.merge(y, z))
    }

  property("VwapAggregator zero is neutral") = forAll(genBuf) { x =>
    VwapAggregator.merge(x, VwapAggregator.zero) == x &&
      VwapAggregator.merge(VwapAggregator.zero, x) == x
  }

  property("VwapAggregator: any partitioning yields the direct result") =
    forAll(Gen.listOfN(20, genRow), Gen.choose(1, 5)) { (rows, nParts) =>
      // direct single-pass fold
      val direct = rows.foldLeft(VwapAggregator.zero)(VwapAggregator.reduce)
      // partitioned: reduce per partition, then merge (what executors do)
      val partitioned = rows.grouped(math.max(1, rows.size / nParts))
        .map(_.foldLeft(VwapAggregator.zero)(VwapAggregator.reduce))
        .foldLeft(VwapAggregator.zero)(VwapAggregator.merge)
      VwapAggregator.finish(direct) == VwapAggregator.finish(partitioned)
    }

  private val genVec: Gen[Array[Double]] =
    Gen.listOfN(16, Gen.choose(-1000, 1000).map(_ / 7.0)).map(_.toArray)

  property("DotProduct eval equals reference sum") = forAll(genVec, genVec) { (x, y) =>
    val e = DotProduct(Literal(1), Literal(1)) // children unused by nullSafeEval
    val got = e.nullSafeEval(new GenericArrayData(x), new GenericArrayData(y))
      .asInstanceOf[Double]
    val want = x.zip(y).foldLeft(0.0) { case (a, (xi, yi)) => a + xi * yi }
    got == want
  }

  property("CosineSimilarity is within [-1, 1] (+eps) and symmetric") =
    forAll(genVec, genVec) { (x, y) =>
      val nonZero = x.exists(_ != 0.0) && y.exists(_ != 0.0)
      val e = CosineSimilarity(Literal(1), Literal(1))
      val a = e.nullSafeEval(new GenericArrayData(x), new GenericArrayData(y))
        .asInstanceOf[Double]
      val b = e.nullSafeEval(new GenericArrayData(y), new GenericArrayData(x))
        .asInstanceOf[Double]
      !nonZero || (a == b && a >= -1.0000001 && a <= 1.0000001)
    }

  private val genHashes: Gen[Array[Long]] =
    Gen.nonEmptyListOf(Gen.long).map(_.toArray)

  property("minhash_sig: signature of a union is elementwise min of signatures") =
    forAll(genHashes, genHashes) { (a, b) =>
      val e = MinHashSignature(Literal(1), 64)
      def sig(hh: Array[Long]) =
        e.nullSafeEval(new GenericArrayData(hh)).asInstanceOf[GenericArrayData]
          .toLongArray()
      // the property that makes MinHash a mergeable sketch: partial
      // signatures combine by elementwise min, independent of partitioning
      val union = sig(a ++ b)
      val merged = sig(a).zip(sig(b)).map { case (x, y) => math.min(x, y) }
      union.sameElements(merged)
    }

  property("minhash_sig: identical hash sets agree on all 64 positions") =
    forAll(genHashes) { a =>
      val e = MinHashSignature(Literal(1), 64)
      val s1 = e.nullSafeEval(new GenericArrayData(a)).asInstanceOf[GenericArrayData]
      val s2 = e.nullSafeEval(new GenericArrayData(a.reverse ++ a))
        .asInstanceOf[GenericArrayData]
      // set semantics: order and duplicates don't change the signature
      s1.toLongArray().sameElements(s2.toLongArray())
    }

  property("simhash64: duplicating every token preserves the fingerprint") =
    forAll(genHashes) { a =>
      val e = SimHash64(Literal(1))
      val s1 = e.nullSafeEval(new GenericArrayData(a))
      val s2 = e.nullSafeEval(new GenericArrayData(a ++ a))
      // doubling all ±1 votes cannot flip any bit's sign
      s1 == s2
    }

  property("signlsh_buckets: positive scaling never changes a bucket (sign invariance)") =
    // powers of two: term-wise scaling is FP-exact, so the projection's sign
    // is provably invariant (an arbitrary scalar could flip a near-zero sum
    // through rounding and make the property flaky)
    forAll(genVec, Gen.oneOf(0.5, 2.0, 4.0, 1024.0)) { (v0, c) =>
      val v = v0 ++ Array.fill(64 - v0.length)(0.0)
      val e = SignLshBuckets(Literal(1), 8, 4)
      def buckets(x: Array[Double]) =
        e.nullSafeEval(new GenericArrayData(x)).asInstanceOf[GenericArrayData]
          .toIntArray()
      buckets(v).sameElements(buckets(v.map(_ * c)))
    }

  property("char_ngrams3 emits max(chars - 2, 0) grams of 3 chars each") =
    forAll(Gen.asciiPrintableStr.map(_.replace("'", ""))) { s =>
      val e = CharNgrams3(Literal(1))
      val grams = e.nullSafeEval(UTF8String.fromString(s))
        .asInstanceOf[GenericArrayData]
      val n = grams.numElements()
      n == math.max(s.length - 2, 0) &&
        (0 until n).forall(i => grams.getUTF8String(i).numChars() == 3)
    }

  property("distributed ntile bucket formula equals SQL ntile semantics") =
    // StatsOps.ntileBuckets assigns bucket = CASE WHEN r <= cut THEN
    // (r-1) div (q+1) + 1 ELSE rem + (r-cut-1) div q + 1 END from the
    // global rank r — pin it against the SQL standard's definition (the
    // first n mod k buckets get ceil(n/k) rows, the rest floor(n/k))
    // for every rank, including n < k and n not divisible by k.
    forAll(Gen.choose(0L, 5000L), Gen.choose(1, 20)) { (n, k) =>
      val q = n / k
      val rem = n % k
      val cut = rem * (q + 1)
      val sizes = Array.tabulate(k)(i => q + (if (i < rem) 1 else 0))
      val cum = sizes.scanLeft(0L)(_ + _)
      (1L to n).forall { r =>
        val got = if (r <= cut) (r - 1) / (q + 1) + 1
                  else rem + (r - cut - 1) / q + 1
        val want = cum.indexWhere(r <= _) // first cumulative bound >= r
        got == want
      }
    }

  property("interval-merge recurrence equals brute-force interval union") =
    // StatsOps.intervalMerge marks a new island iff no PRECEDING interval's
    // end reaches the current start (running max of end over the start
    // order) — pin that recurrence against literal set-union of intervals
    // for random starts, including duplicates and touching endpoints.
    forAll(Gen.listOf(Gen.choose(0L, 400L))) { starts =>
      val len = 50L
      val sorted = starts.sorted
      // the windowed recurrence, replicated sequentially
      var maxEnd = Long.MinValue
      var islands = 0
      var covered = 0L
      var islandStart = 0L
      sorted.foreach { s =>
        if (maxEnd == Long.MinValue || s > maxEnd) {
          if (maxEnd != Long.MinValue) covered += maxEnd - islandStart
          islands += 1; islandStart = s; maxEnd = s + len
        } else maxEnd = math.max(maxEnd, s + len)
      }
      if (maxEnd != Long.MinValue) covered += maxEnd - islandStart
      // brute force: membership count over the union of half-open intervals
      val points = sorted.flatMap(s => s until s + len).toSet
      val bruteCovered = points.size.toLong
      val bruteIslands =
        if (sorted.isEmpty) 0
        else 1 + sorted.sliding(2).count {
          case Seq(a, b) => b > a + len
          case _         => false
        }
      islands == bruteIslands && covered == bruteCovered
    }

  property("pareto prefix-max formulation equals brute-force dominance") =
    // StatsOps.paretoFront: after collapsing to max size per price, a
    // point survives iff every strictly-cheaper point has smaller size —
    // computed as bucketed within-bucket prefix max + cross-bucket
    // carry-in. Pin that decomposition against the quadratic NOT EXISTS
    // definition on random points.
    forAll(Gen.listOf(Gen.zip(Gen.choose(0, 80), Gen.choose(0, 40)))) { pts =>
      val byPrice = pts.groupBy(_._1).map { case (p, g) => p -> g.map(_._2).max }
      val w = 10 // bucket width
      val buckets = byPrice.groupBy { case (p, _) => p / w }
      val bmax = buckets.map { case (b, m) => b -> m.values.max }
      val got = byPrice.filter { case (p, s) =>
        val sameBucketPrev = buckets(p / w).filter { case (q, _) => q < p }
          .values.maxOption.getOrElse(Int.MinValue)
        val carry = bmax.filter { case (b, _) => b < p / w }
          .values.maxOption.getOrElse(Int.MinValue)
        math.max(sameBucketPrev, carry) < s
      }.keySet
      val want = byPrice.filter { case (p, s) =>
        !byPrice.exists { case (q, t) => q < p && t >= s }
      }.keySet
      got == want
    }

  property("unknown-magic payloads quarantine, never fake a parse") =
    forAll(Gen.choose(0, 1000), Gen.choose(0L, 1000000L)) { (n, id) =>
      // 0xEE never begins any sniffable format's magic
      val row = MultimodalOps.MediaRow(id, Array.fill(n + 1)(0xEE.toByte))
      val m = MultimodalOps.realDecode(row)
      m.format == "unknown" && m.width == 0 && m.height == 0 &&
        m.n_bytes == n + 1
    }

  property("WAV encode/decode round-trips any clip exactly") =
    forAll(
      Gen.oneOf(8000, 16000, 44100),
      Gen.choose(1, 4),
      Gen.choose(1, 400),
      Gen.long) { (rate, chans, frames, seed) =>
      val rnd = new scala.util.Random(seed)
      val samples = Array.fill(frames * chans)(rnd.nextInt(65536) - 32768)
        .map(_.toShort)
      val clip = graft.ops.AudioCodec.Audio(rate, chans, samples)
      val back = graft.ops.AudioCodec.decodeWav(graft.ops.AudioCodec.encodeWav(clip))
      back.sampleRate == rate && back.channels == chans &&
        back.samples.sameElements(samples)
    }

  property("audio buildClip geometry is the documented pure function of byte length") =
    forAll(Gen.choose(0, 5000), Gen.long) { (n, seed) =>
      val bytes = { val r = new scala.util.Random(seed); Array.fill(n)(r.nextInt(256).toByte) }
      val clip = graft.ops.AudioOps.buildClip(bytes)
      clip.sampleRate == Seq(8000, 16000, 44100)((n / 64) % 3) &&
        clip.channels == 1 + (n / 32) % 2 &&
        clip.frames == 256 + ((n / 16) * 31) % 2048 &&
        graft.ops.AudioCodec.decodeWav(graft.ops.AudioOps.buildPayload(bytes))
          .samples.sameElements(clip.samples)
    }

  property("GIF encode/decode round-trips any palette-bounded image") =
    forAll(Gen.choose(1, 24), Gen.choose(1, 24), Gen.choose(1, 256), Gen.long) {
      (w, h, nColors, seed) =>
        val r = new scala.util.Random(seed)
        // draw pixels from a bounded palette so the encoder's 256-color
        // gate never fires; colors themselves are random RGB triples
        val palette = Array.fill(nColors)(r.nextInt(1 << 24))
        val rgb = new Array[Byte](3 * w * h)
        for (i <- 0 until w * h) {
          val c = palette(r.nextInt(nColors))
          rgb(3 * i) = (c >> 16).toByte
          rgb(3 * i + 1) = (c >> 8).toByte
          rgb(3 * i + 2) = c.toByte
        }
        val img = graft.ops.ImageCodec.Image(w, h, rgb)
        val back = graft.ops.ImageCodec.decodeGif(graft.ops.ImageCodec.encodeGif(img))
        back.width == w && back.height == h && back.rgb.sameElements(rgb)
    }

  // ---- round-7 op algebra ----

  /** macd_num = 26·Σ12 − 12·Σ26 over trailing windows (IndicatorOps.macd). */
  private def macdNums(xs: List[Long]): List[Long] =
    (25 until xs.length).toList.map { i =>
      26L * xs.slice(i - 11, i + 1).sum - 12L * xs.slice(i - 25, i + 1).sum
    }

  property("macd oscillator is invariant under a constant price shift") =
    forAll(Gen.listOfN(40, Gen.choose(100L, 100000L)), Gen.choose(-5000L, 5000L)) {
      (xs, c) => macdNums(xs) == macdNums(xs.map(_ + c))
    }

  property("realized_vol variance numerator is shift-invariant and non-negative") =
    forAll(Gen.listOfN(31, Gen.choose(100L, 1000000L)), Gen.choose(-9999L, 9999L)) {
      (xs, c) =>
        def varNum(s: List[Long]): BigInt = {
          val d = s.sliding(2).map { case List(a, b) => BigInt(b - a) }.toList
          BigInt(d.length) * d.map(x => x * x).sum - d.sum * d.sum
        }
        val v = varNum(xs)
        v >= 0 && v == varNum(xs.map(_ + c))
    }

  /** The gaps-and-islands drawdown formulation (group key = prefix count of
    * new-high candles, run = group size − 1) equals a direct scan.
    */
  property("drawdown islands equal the sequential underwater scan") =
    forAll(Gen.listOfN(60, Gen.choose(1L, 50L))) { xs =>
      // direct scan
      var runmax = Long.MinValue; var cur = 0L; var mx = 0L; var tot = 0L
      xs.foreach { x =>
        runmax = math.max(runmax, x)
        if (x < runmax) { cur += 1; tot += 1; mx = math.max(mx, cur) } else cur = 0
      }
      // island formulation (what the window plan computes)
      val runmaxes = xs.scanLeft(Long.MinValue)(math.max).tail
      val uw = xs.zip(runmaxes).map { case (x, m) => if (x < m) 1L else 0L }
      val grp = uw.map(1L - _).scanLeft(0L)(_ + _).tail
      val runs = uw.zip(grp).groupBy(_._2).view.mapValues(_.map(_._1).sum).values.toList
      mx == runs.maxOption.getOrElse(0L) && tot == runs.sum
    }

  property("benford first digit via cents-string head is the true leading digit") =
    forAll(Gen.choose(1L, 99999999999L)) { cents =>
      val viaString = cents.toString.head.asDigit
      var m = cents
      while (m >= 10) m /= 10
      viaString == m.toInt && viaString >= 1 && viaString <= 9
    }

  /** cci numerator/deviation pair (IndicatorOps.cci20, K=20): both are
    * invariant under a constant shift of the typical price (the SMA
    * absorbs it), so CCI is level-free — the property that makes it
    * comparable across symbols.
    */
  property("cci numerator and deviation are shift-invariant") =
    forAll(Gen.listOfN(20, Gen.choose(300L, 3000000L)), Gen.choose(-90000L, 90000L)) {
      (tps, c) =>
        def pair(s: List[Long]): (Long, Long) = {
          val s20 = s.sum
          (20L * s.last - s20, s.map(t => math.abs(20L * t - s20)).sum)
        }
        pair(tps) == pair(tps.map(_ + c))
    }

  /** source_divergence's common-denominator restatement: the exact-integer
    * Σ_both|ca·nb − cb·na| + nb·(na − Σca) + na·(nb − Σcb) over 2·na·nb
    * equals the textbook 0.5·Σ_union|ca/na − cb/nb| within float noise.
    */
  property("TV distance integer restatement equals the direct union sum") =
    forAll(
      Gen.mapOf(Gen.zip(Gen.choose(1, 30), Gen.choose(1L, 50L))),
      Gen.mapOf(Gen.zip(Gen.choose(1, 30), Gen.choose(1L, 50L)))) { (ma, mb) =>
      if (ma.isEmpty || mb.isEmpty) Prop.passed
      else {
        val na = ma.values.sum; val nb = mb.values.sum
        val union = ma.keySet ++ mb.keySet
        val direct = 0.5 * union.toList.map { k =>
          math.abs(ma.getOrElse(k, 0L).toDouble / na -
            mb.getOrElse(k, 0L).toDouble / nb)
        }.sum
        val both = ma.keySet & mb.keySet
        val bothNum = both.toList.map(k =>
          BigInt((ma(k) * nb - mb(k) * na).abs)).sum
        val sca = both.toList.map(ma).sum
        val scb = both.toList.map(mb).sum
        val num = bothNum + BigInt(nb) * (na - sca) + BigInt(na) * (nb - scb)
        val restated = num.toDouble / (2.0 * na.toDouble * nb.toDouble)
        Prop(math.abs(restated - direct) < 1e-9)
      }
    }

  /** vocab_growth's one-pass formulation: prefix vocabulary as the running
    * sum of per-doc new-token counts (token enters at its min doc index)
    * equals the direct distinct count over each prefix.
    */
  property("prefix vocabulary via min-doc new-token counts equals direct distinct") =
    forAll(Gen.listOf(Gen.listOf(Gen.choose(0, 20)))) { docs =>
      val firstAt = docs.zipWithIndex
        .flatMap { case (ts, i) => ts.map(t => (t, i)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      val newCounts = docs.indices.map(i => firstAt.count(_._2 == i).toLong)
      val running = newCounts.scanLeft(0L)(_ + _).tail
      docs.indices.forall { i =>
        running(i) == docs.take(i + 1).flatten.distinct.size.toLong
      }
    }

  // checkpointed offsets survive a process restart only if serialization
  // round-trips exactly and deterministically (byte-stable JSON: the
  // offset log compares entries textually)
  property("Kafka offset JSON round-trips and is order-canonical") = {
    val genTp = for {
      t <- Gen.oneOf("alpha", "beta", "gamma-topic")
      p <- Gen.choose(0, 31)
      o <- Gen.choose(0L, Long.MaxValue / 2)
    } yield ((t, p), o)
    forAll(Gen.mapOf(genTp)) { m =>
      val json = graft.kafka.EmulatedKafka.offsetsToJson(m)
      val back = graft.kafka.EmulatedKafka.jsonToOffsets(json)
      val shuffled = graft.kafka.EmulatedKafka.offsetsToJson(
        scala.util.Random.shuffle(m.toList).toMap)
      back == m && shuffled == json
    }
  }

  property("word_window_hashes equals xxhash64 of the joined window tokens") = {
    val genTok = Gen.oneOf(Gen.alphaNumStr.map(_.take(6)), Gen.const(""))
    forAll(Gen.listOfN(30, genTok), Gen.choose(1, 8)) { (toks, w) =>
      val text = toks.mkString(" ")
      val got = graft.functions.WordWindowHashes.hashes(
        org.apache.spark.unsafe.types.UTF8String.fromString(text), w)
        .toLongArray().toSeq
      val words = text.trim.split(" ", -1)
      val expect =
        if (text.trim.isEmpty || words.length < w) Seq.empty[Long]
        else (0 to words.length - w).map { i =>
          val s = org.apache.spark.unsafe.types.UTF8String.fromString(
            words.slice(i, i + w).mkString(" "))
          org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
            s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        }
      got == expect
    }
  }

  property("gini impurity is replication-invariant and within [0, 1)") =
    forAll(Gen.nonEmptyListOf(Gen.choose(1L, 1000L)), Gen.choose(2, 5)) { (counts, k) =>
      def gini(cs: List[Long]): Double = {
        val n = cs.sum.toDouble
        1.0 - cs.map(c => c.toDouble * c.toDouble).sum / (n * n)
      }
      val g = gini(counts)
      g >= 0.0 && g < 1.0 && math.abs(g - gini(counts.map(_ * k))) < 1e-12
    }

  private val genImage: Gen[graft.ops.ImageCodec.Image] = for {
    w <- Gen.choose(1, 40)
    h <- Gen.choose(1, 40)
    rgb <- Gen.containerOfN[Array, Byte](3 * w * h, Gen.choose(-128, 127).map(_.toByte))
  } yield graft.ops.ImageCodec.Image(w, h, rgb)

  property("ImageCodec PPM and BMP round-trips are identity") =
    forAll(genImage) { img =>
      val p = graft.ops.ImageCodec.decodePpm(graft.ops.ImageCodec.encodePpm(img))
      val b = graft.ops.ImageCodec.decodeBmp(graft.ops.ImageCodec.encodeBmp(img))
      p.width == img.width && p.height == img.height &&
        java.util.Arrays.equals(p.rgb, img.rgb) &&
        b.width == img.width && b.height == img.height &&
        java.util.Arrays.equals(b.rgb, img.rgb)
    }

  property("dhash64 is encoding-invariant (same pixels, PPM vs BMP)") = {
    val genBig: Gen[graft.ops.ImageCodec.Image] = for {
      w <- Gen.choose(9, 40)
      h <- Gen.choose(8, 40)
      rgb <- Gen.containerOfN[Array, Byte](3 * w * h, Gen.choose(-128, 127).map(_.toByte))
    } yield graft.ops.ImageCodec.Image(w, h, rgb)
    forAll(genBig) { img =>
      // the perceptual hash sees pixels, not the container format
      MultimodalOps.phash64(graft.ops.ImageCodec.encodePpm(img)) ==
        MultimodalOps.phash64(graft.ops.ImageCodec.encodeBmp(img))
    }
  }

  property("HilbertIndex.compute masks, stays on-curve, and is unit-adjacent") = {
    import graft.functions.HilbertIndex
    val n2 = (1L << HilbertIndex.Bits) * (1L << HilbertIndex.Bits)
    val genCoord = Gen.choose(Long.MinValue, Long.MaxValue)
    val genSmall = Gen.choose(0L, (1L << HilbertIndex.Bits) - 2)
    Prop.all(
      // masking contract: any coordinate keys as its low-Bits twin, and
      // every key is a genuine curve index in [0, N^2)
      forAll(genCoord, genCoord) { (x, y) =>
        val d = HilbertIndex.compute(x, y)
        d == HilbertIndex.compute(x & HilbertIndex.Mask, y & HilbertIndex.Mask) &&
          d >= 0 && d < n2
      },
      // local injectivity: the four in-grid neighbors of a cell never
      // collide with it (bijectivity probed pointwise at full 16-bit
      // scale, where the exhaustive check lives at 5 bits in HilbertSpec)
      forAll(genSmall, genSmall) { (x, y) =>
        val d = HilbertIndex.compute(x, y)
        Seq((x + 1, y), (x, y + 1)).forall { case (a, b) =>
          HilbertIndex.compute(a, b) != d
        }
      })
  }
}
