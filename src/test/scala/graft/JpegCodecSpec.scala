package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{ImageCodec, JpegCodec, MultimodalOps}
import graft.ops.ImageCodec.Image

/** Ground truth for the JPEG codec: exact round trips on constant-tile
  * images (the analytic DC-only chain the jpeg_features oracle
  * replays), bounded-error round trips through the general FDCT/IDCT
  * path, color + subsampling + restart-marker decode, PROGRESSIVE
  * (SOF2) decode against hand-assembled multi-scan bitstreams —
  * spectral selection, successive approximation, cross-block EOB runs —
  * and the crafted-payload rejections the quarantine contract depends
  * on.
  */
class JpegCodecSpec extends AnyFunSuite {

  /** The analytic constant-block round trip at the fixture quality:
    * clamp(round(round(8(v-128)/qd)*qd/8)+128).
    */
  private def dcRoundTrip(v: Int): Int = {
    val qd = JpegCodec.QuantDc
    val dcq = Math.round(8.0 * (v - 128) / qd)
    val p = Math.round(dcq * qd / 8.0).toInt + 128
    math.max(0, math.min(255, p))
  }

  private def grayImage(w: Int, h: Int, value: (Int, Int) => Int): Image = {
    val rgb = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = value(x, y).toByte
      val p = 3 * (y * w + x)
      rgb(p) = v; rgb(p + 1) = v; rgb(p + 2) = v
    }
    Image(w, h, rgb)
  }

  test("constant-tile gray image round-trips EXACTLY through the DC chain") {
    // 24x16: 3x2 tiles of distinct values, incl. the clamp-at-255 case
    val tiles = Array(Array(0, 97, 255), Array(128, 31, 200))
    val img = grayImage(24, 16, (x, y) => tiles(y / 8)(x / 8))
    val jpeg = JpegCodec.encodeJpeg(img)
    assert(ImageCodec.sniff(jpeg).contains("jpeg"))
    val dec = ImageCodec.decode(jpeg)
    assert(dec.width == 24 && dec.height == 16)
    for (y <- 0 until 16; x <- 0 until 24) {
      val want = dcRoundTrip(tiles(y / 8)(x / 8))
      val got = dec.rgb(3 * (y * 24 + x)) & 0xff
      assert(got == want, s"($x,$y): got $got want $want")
    }
    // the quantization must actually bite somewhere (odd v-128 steps)
    assert(dcRoundTrip(97) != 97, "fixture quality quantizes odd steps")
  }

  test("gradient gray image survives the general FDCT/IDCT within tight error") {
    val img = grayImage(32, 24, (x, y) => (x * 5 + y * 3) % 256)
    val dec = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(img, quality = 90))
    var maxErr = 0
    for (i <- 0 until 32 * 24) {
      val e = math.abs((dec.rgb(3 * i) & 0xff) - (img.rgb(3 * i) & 0xff))
      maxErr = math.max(maxErr, e)
    }
    // quality 90 on a smooth ramp: per-pixel error stays single-digit
    // except at the wrap discontinuity, where ringing is expected
    assert(maxErr <= 40, s"max error $maxErr")
    val n = 32 * 24
    val mean = (0 until n).map(i =>
      math.abs((dec.rgb(3 * i) & 0xff) - (img.rgb(3 * i) & 0xff))).sum.toDouble / n
    assert(mean <= 4.0, s"mean error $mean")
  }

  test("color image round-trips through YCbCr with bounded error; odd dims pad") {
    val w = 19; val h = 13 // forces edge-replicated partial blocks
    val rgb = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = 3 * (y * w + x)
      rgb(p) = ((x * 13) % 256).toByte
      rgb(p + 1) = ((y * 17) % 256).toByte
      rgb(p + 2) = ((x + y) * 7 % 256).toByte
    }
    val img = Image(w, h, rgb)
    val jpeg = JpegCodec.encodeJpeg(img, quality = 90)
    val dec = JpegCodec.decodeJpeg(jpeg)
    assert(dec.width == w && dec.height == h)
    var maxErr = 0
    for (i <- 0 until 3 * w * h)
      maxErr = math.max(maxErr, math.abs((dec.rgb(i) & 0xff) - (rgb(i) & 0xff)))
    assert(maxErr <= 60, s"max channel error $maxErr") // chroma quant is coarse
  }

  test("restart markers: DRI/RSTn decode equals the unrestarted stream") {
    val tiles = Array.tabulate(2, 4)((j, i) => 40 * j + 30 * i)
    val img = grayImage(32, 16, (x, y) => tiles(y / 8)(x / 8))
    val plain = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(img))
    val restarted = JpegCodec.encodeJpeg(img, restartInterval = 2)
    // the restarted stream must actually contain RST0 (FFD0)
    assert((0 until restarted.length - 1).exists(i =>
      (restarted(i) & 0xff) == 0xff && (restarted(i + 1) & 0xff) == 0xd0))
    val dec = JpegCodec.decodeJpeg(restarted)
    assert(dec.rgb.sameElements(plain.rgb))
  }

  test("grayscale input auto-emits a 1-component stream; color emits 3") {
    def nComps(jpeg: Array[Byte]): Int = {
      // find SOF0 and read its component count
      var p = 2
      while (!((jpeg(p) & 0xff) == 0xff && (jpeg(p + 1) & 0xff) == 0xc0)) p += 1
      jpeg(p + 9) & 0xff
    }
    val gray = grayImage(16, 8, (x, _) => x * 10)
    assert(nComps(JpegCodec.encodeJpeg(gray)) == 1)
    val rgb = new Array[Byte](3 * 16 * 8)
    rgb(0) = 10; rgb(1) = 20; rgb(2) = 30 // one non-gray pixel
    assert(nComps(JpegCodec.encodeJpeg(Image(16, 8, rgb))) == 3)
  }

  test("4:2:0 subsampled streams decode (hand-assembled 2x2-sampling MCU)") {
    // the encoder emits 4:4:4 only, so the subsampled path gets a
    // HAND-ASSEMBLED stream: a 16x16 gray-100 image as one 4:2:0 MCU —
    // 4 DC-only Y blocks (first diff -14 at quality 50, then zeros) and
    // one flat Cb + Cr block each (diff 0 -> dequantized 128 -> gray).
    // Tables (DQT/DHT) are lifted from a real encoder stream; the 41
    // entropy bits are written out by hand against Annex K:
    //   Y1: DC cat4 '101' + mag '0001' + EOB '1010'
    //   Y2..Cr: DC cat0 '00' + EOB '1010'  (x5)
    // padded with 1s = A3 45 14 51 45 7F.
    val good = JpegCodec.encodeJpeg(grayImage(16, 16, (_, _) => 100))
    def segment(marker: Int): Array[Byte] = {
      var p = 2
      while (!((good(p) & 0xff) == 0xff && (good(p + 1) & 0xff) == marker)) p += 1
      val len = ((good(p + 2) & 0xff) << 8) | (good(p + 3) & 0xff)
      java.util.Arrays.copyOfRange(good, p, p + 2 + len)
    }
    def segments(marker: Int): Array[Byte] = { // both DHT segments
      val out = new java.io.ByteArrayOutputStream()
      var p = 2
      while (p + 1 < good.length) {
        if ((good(p) & 0xff) == 0xff && (good(p + 1) & 0xff) == marker) {
          val len = ((good(p + 2) & 0xff) << 8) | (good(p + 3) & 0xff)
          out.write(good, p, 2 + len)
          p += 2 + len
        } else p += 1
      }
      out.toByteArray
    }
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array[Byte](0xff.toByte, 0xd8.toByte)) // SOI
    bos.write(segment(0xdb))                         // DQT (luma, id 0)
    bos.write(Array[Byte](                           // SOF0: 3 comps, Y 2x2
      0xff.toByte, 0xc0.toByte, 0x00, 0x11, 0x08,
      0x00, 0x10, 0x00, 0x10, 0x03,
      0x01, 0x22, 0x00, 0x02, 0x11, 0x00, 0x03, 0x11, 0x00))
    bos.write(segments(0xc4))                        // DHT (DC0 + AC0)
    bos.write(Array[Byte](                           // SOS: all comps tables 0
      0xff.toByte, 0xda.toByte, 0x00, 0x0c, 0x03,
      0x01, 0x00, 0x02, 0x00, 0x03, 0x00, 0x00, 0x3f, 0x00))
    bos.write(Array[Byte](                           // entropy-coded MCU
      0xa3.toByte, 0x45, 0x14, 0x51, 0x45, 0x7f))
    bos.write(Array[Byte](0xff.toByte, 0xd9.toByte)) // EOI
    val dec = JpegCodec.decodeJpeg(bos.toByteArray)
    assert(dec.width == 16 && dec.height == 16)
    assert(dec.rgb.forall(b => (b & 0xff) == dcRoundTrip(100)))
  }

  test("crafted payloads reject as IllegalArgumentException, never array errors") {
    val good = JpegCodec.encodeJpeg(grayImage(16, 16, (_, _) => 50))
    def mutated(f: Array[Byte] => Array[Byte]): Array[Byte] = f(good.clone())

    // truncated entropy stream
    intercept[IllegalArgumentException] {
      JpegCodec.decodeJpeg(java.util.Arrays.copyOf(good, good.length - 6))
    }
    // SOF marker flipped to SOF2 without progressive-legal scans: the
    // baseline full-band SOS is malformed under SOF2 (a progressive
    // scan may not mix DC and AC) and must reject, not mis-decode
    intercept[IllegalArgumentException] {
      JpegCodec.decodeJpeg(mutated { b =>
        var p = 2
        while (!((b(p) & 0xff) == 0xff && (b(p + 1) & 0xff) == 0xc0)) p += 1
        b(p + 1) = 0xc2.toByte; b
      })
    }
    // huge SOF dimensions fail the area bound before any allocation
    intercept[IllegalArgumentException] {
      JpegCodec.decodeJpeg(mutated { b =>
        var p = 2
        while (!((b(p) & 0xff) == 0xff && (b(p + 1) & 0xff) == 0xc0)) p += 1
        // h = w = 65500 (within MaxDim, area >> MaxPixels)
        b(p + 5) = 0xff.toByte; b(p + 6) = 0xdc.toByte
        b(p + 7) = 0xff.toByte; b(p + 8) = 0xdc.toByte; b
      })
    }
    // zero quantizer
    intercept[IllegalArgumentException] {
      JpegCodec.decodeJpeg(mutated { b =>
        var p = 2
        while (!((b(p) & 0xff) == 0xff && (b(p + 1) & 0xff) == 0xdb)) p += 1
        b(p + 5) = 0; b
      })
    }
    // no SOS
    intercept[IllegalArgumentException] {
      JpegCodec.decodeJpeg(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte))
    }
    // 16-bit quant table precision
    intercept[IllegalArgumentException] {
      JpegCodec.decodeJpeg(mutated { b =>
        var p = 2
        while (!((b(p) & 0xff) == 0xff && (b(p + 1) & 0xff) == 0xdb)) p += 1
        b(p + 4) = 0x10; b
      })
    }
  }

  test("realDecode and phash64 quarantine corrupt JPEGs (decode-slot totality)") {
    val good = JpegCodec.encodeJpeg(grayImage(16, 16, (_, _) => 50))
    val bad = good.clone()
    bad(bad.length - 8) = 0x55 // corrupt the entropy tail... may or may not throw
    var p = 2
    while (!((good(p) & 0xff) == 0xff && (good(p + 1) & 0xff) == 0xc0)) p += 1
    val crafted = good.clone()
    crafted(p + 5) = 0xff.toByte; crafted(p + 6) = 0xdc.toByte
    crafted(p + 7) = 0xff.toByte; crafted(p + 8) = 0xdc.toByte
    val meta = MultimodalOps.realDecode(MultimodalOps.MediaRow(7L, crafted))
    assert(meta.format == "corrupt" && meta.width == 0)
    MultimodalOps.phash64(crafted) // must not throw
  }

  test("dhash of a JPEG round trip stays within a few bits of the source") {
    val textBytes = ("the quick brown fox jumps over the lazy dog " * 4).getBytes
    val img = MultimodalOps.buildJpegImage(textBytes)
    val dec = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(img))
    val d = java.lang.Long.bitCount(
      ImageCodec.dhash64(img) ^ ImageCodec.dhash64(dec))
    assert(d <= 3, s"dhash moved $d bits through the codec")
  }

  test("buildJpegImage: 8-aligned constant tiles; features match the analytic formula") {
    val textBytes = "a small but representative document body".getBytes
    val nb = textBytes.length
    val img = MultimodalOps.buildJpegImage(textBytes)
    val tx = 2 + (nb / 16) % 16
    val ty = 2 + (nb / 32) % 16
    assert(img.width == 8 * tx && img.height == 8 * ty)
    val m = math.min(math.max(nb, 1), 128)
    val dec = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(img))
    for (y <- 0 until img.height; x <- 0 until img.width) {
      val v = textBytes(((y / 8) * tx + (x / 8)) % m) & 0xff
      assert((dec.rgb(3 * (y * img.width + x)) & 0xff) == dcRoundTrip(v))
    }
  }

  // ---- progressive (SOF2) ----------------------------------------------

  /** Lift a whole marker segment (FFxx + length + payload) from a real
    * encoder stream.
    */
  private def liftSegment(src: Array[Byte], marker: Int): Array[Byte] = {
    var p = 2
    while (!((src(p) & 0xff) == 0xff && (src(p + 1) & 0xff) == marker)) p += 1
    val len = ((src(p + 2) & 0xff) << 8) | (src(p + 3) & 0xff)
    java.util.Arrays.copyOfRange(src, p, p + 2 + len)
  }

  private def bytesOf(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  /** DHT segment from explicit (bits, vals). */
  private def dht(tcTh: Int, bits: Seq[Int], vals: Seq[Int]): Array[Byte] = {
    val len = 2 + 1 + 16 + vals.length
    bytesOf(Seq(0xff, 0xc4, len >> 8, len & 0xff, tcTh) ++ bits ++ vals: _*)
  }

  /** SOS header for one component (id 1, tables 0). */
  private def sos1(ss: Int, se: Int, ahAl: Int): Array[Byte] =
    bytesOf(0xff, 0xda, 0x00, 0x08, 0x01, 0x01, 0x00, ss, se, ahAl)

  private def sof2gray(w: Int, h: Int): Array[Byte] =
    bytesOf(0xff, 0xc2, 0x00, 0x0b, 0x08, h >> 8, h & 0xff, w >> 8, w & 0xff,
      0x01, 0x01, 0x11, 0x00)

  test("progressive: hand-assembled DC + AC-EOB scans decode a constant image") {
    // 16x16 gray-100: 4 DC-only blocks. Scan 1 delivers DC (diff -14 =
    // cat4 then three zero diffs), scan 2 covers the whole AC band of
    // all 4 blocks with one EOB2 run (eobrun = 4-1+0). Custom minimal
    // Huffman tables: DC {0:'0', 4:'10'}, AC {0x20:'0'}.
    val good = JpegCodec.encodeJpeg(grayImage(16, 16, (_, _) => 100))
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(bytesOf(0xff, 0xd8))
    bos.write(liftSegment(good, 0xdb))
    bos.write(sof2gray(16, 16))
    bos.write(dht(0x00, Seq(1, 1) ++ Seq.fill(14)(0), Seq(0x00, 0x04)))
    bos.write(dht(0x10, Seq(1) ++ Seq.fill(15)(0), Seq(0x20)))
    bos.write(sos1(0, 0, 0x00))
    bos.write(bytesOf(0x84, 0x7f)) // '10'+'0001' then '0','0','0', pad 1s
    bos.write(sos1(1, 63, 0x00))
    bos.write(bytesOf(0x1f))       // EOB2 '0' + 2 extra bits '00', pad 1s
    bos.write(bytesOf(0xff, 0xd9))
    val dec = JpegCodec.decodeJpeg(bos.toByteArray)
    assert(dec.width == 16 && dec.height == 16)
    assert(dec.rgb.forall(b => (b & 0xff) == dcRoundTrip(100)))
  }

  test("progressive: successive approximation refines DC to the exact value") {
    // gray-105 -> dcq = -11 (odd): Al=1 scan carries -6 (arith shift),
    // the Ah=1->Al=0 refinement adds the low bit of every block (all 1s
    // -> an 0xFF data byte, so the stuffing path runs too).
    val good = JpegCodec.encodeJpeg(grayImage(16, 16, (_, _) => 105))
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(bytesOf(0xff, 0xd8))
    bos.write(liftSegment(good, 0xdb))
    bos.write(sof2gray(16, 16))
    bos.write(dht(0x00, Seq(1, 1) ++ Seq.fill(14)(0), Seq(0x00, 0x03)))
    bos.write(dht(0x10, Seq(1) ++ Seq.fill(15)(0), Seq(0x20)))
    bos.write(sos1(0, 0, 0x01))    // DC first, Al=1
    bos.write(bytesOf(0x88))       // '10'+'001' then '0','0','0' = 8 bits
    bos.write(sos1(0, 0, 0x10))    // DC refinement, Ah=1 Al=0
    bos.write(bytesOf(0xff, 0x00)) // 4 one-bits + 1-pad = 0xFF, stuffed
    bos.write(sos1(1, 63, 0x00))
    bos.write(bytesOf(0x1f))
    bos.write(bytesOf(0xff, 0xd9))
    val dec = JpegCodec.decodeJpeg(bos.toByteArray)
    assert(dec.rgb.forall(b => (b & 0xff) == dcRoundTrip(105)),
      s"got ${dec.rgb(0) & 0xff} want ${dcRoundTrip(105)}")
  }

  test("progressive: AC successive approximation equals the same-coefficient baseline") {
    // one 8x8 block, dc=0, AC(zz 1)=+2. Baseline delivers it whole;
    // progressive splits it into an Al=1 scan (value 1) and an Ah=1->0
    // correction scan (low bit 0) — both decodes must agree bit-for-bit.
    val good = JpegCodec.encodeJpeg(grayImage(8, 8, (_, _) => 100))
    val base = new java.io.ByteArrayOutputStream()
    base.write(bytesOf(0xff, 0xd8))
    base.write(liftSegment(good, 0xdb))
    base.write(bytesOf(0xff, 0xc0, 0x00, 0x0b, 0x08, 0x00, 0x08, 0x00, 0x08,
      0x01, 0x01, 0x11, 0x00))
    base.write(liftSegment(good, 0xc4)) // Annex-K DC (first DHT)
    // lift the AC DHT: second C4 segment
    locally {
      var p = 2
      var seen = 0
      while (seen < 1) {
        if ((good(p) & 0xff) == 0xff && (good(p + 1) & 0xff) == 0xc4) seen += 1
        p += 1
      }
      var q = p + 1
      while (!((good(q) & 0xff) == 0xff && (good(q + 1) & 0xff) == 0xc4)) q += 1
      val len = ((good(q + 2) & 0xff) << 8) | (good(q + 3) & 0xff)
      base.write(good, q, 2 + len)
    }
    base.write(sos1(0, 63, 0x00))
    // DC cat0 '00'; AC sym 0x02 '01' + mag '10'; EOB '1010'; pad
    base.write(bytesOf(0x1a, 0xbf))
    base.write(bytesOf(0xff, 0xd9))
    val baseline = JpegCodec.decodeJpeg(base.toByteArray)

    val prog = new java.io.ByteArrayOutputStream()
    prog.write(bytesOf(0xff, 0xd8))
    prog.write(liftSegment(good, 0xdb))
    prog.write(sof2gray(8, 8))
    prog.write(dht(0x00, Seq(1) ++ Seq.fill(15)(0), Seq(0x00)))
    prog.write(dht(0x10, Seq(1, 1) ++ Seq.fill(14)(0), Seq(0x01, 0x00)))
    prog.write(sos1(0, 0, 0x00))
    prog.write(bytesOf(0x7f))       // DC diff 0, pad
    prog.write(sos1(1, 63, 0x01))   // AC first, Al=1: sym 0x01 '0' + mag '1', EOB0 '10'
    prog.write(bytesOf(0x6f))
    prog.write(sos1(1, 63, 0x10))   // AC refine: EOB0 '10' + correction bit '0'
    prog.write(bytesOf(0x9f))
    prog.write(bytesOf(0xff, 0xd9))
    val progressive = JpegCodec.decodeJpeg(prog.toByteArray)

    assert(progressive.rgb.sameElements(baseline.rgb))
    // the AC coefficient must actually shape the block (not flat)
    assert(baseline.rgb.map(_ & 0xff).distinct.length > 1)
  }

  test("progressive: truncated mid-scan and missing-EOI streams reject as IAE") {
    val good = JpegCodec.encodeJpeg(grayImage(16, 16, (_, _) => 100))
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(bytesOf(0xff, 0xd8))
    bos.write(liftSegment(good, 0xdb))
    bos.write(sof2gray(16, 16))
    bos.write(dht(0x00, Seq(1, 1) ++ Seq.fill(14)(0), Seq(0x00, 0x04)))
    bos.write(dht(0x10, Seq(1) ++ Seq.fill(15)(0), Seq(0x20)))
    bos.write(sos1(0, 0, 0x00))
    bos.write(bytesOf(0x84, 0x7f))
    val noEoi = bos.toByteArray // DC scan complete, then nothing
    intercept[IllegalArgumentException] { JpegCodec.decodeJpeg(noEoi) }
    // progressive area bomb: dims within MaxPixels but over the
    // progressive cap must reject at SOF, before coefficient allocation
    val bomb = new java.io.ByteArrayOutputStream()
    bomb.write(bytesOf(0xff, 0xd8))
    bomb.write(liftSegment(good, 0xdb))
    bomb.write(sof2gray(8160, 8160)) // 66.6M > 2^24, < 2^26
    intercept[IllegalArgumentException] { JpegCodec.decodeJpeg(bomb.toByteArray) }
  }
}
