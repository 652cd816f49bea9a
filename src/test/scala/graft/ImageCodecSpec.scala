package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{ImageCodec, MultimodalOps}
import graft.ops.ImageCodec.Image

/** Byte-level ground truth for the pure-JVM image codecs: hand-built
  * encoded payloads decode to exactly the expected pixels (header parse,
  * comments, BMP bottom-up rows and padding all exercised against bytes
  * written out by hand, not by the encoder under test), encode→decode
  * round-trips are identity, and the dHash bits are pinned on an image
  * whose 9×8 downsample is the identity map.
  */
class ImageCodecSpec extends AnyFunSuite {

  test("decodePpm parses a hand-built P6 byte-for-byte") {
    // 2x2: red, green / blue, white — header written out by hand
    val bytes =
      "P6\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](
        255.toByte, 0, 0,   0, 255.toByte, 0,
        0, 0, 255.toByte,   255.toByte, 255.toByte, 255.toByte)
    val img = ImageCodec.decodePpm(bytes)
    assert(img.width == 2 && img.height == 2)
    assert(img.rgb.toSeq == Seq[Byte](
      255.toByte, 0, 0, 0, 255.toByte, 0,
      0, 0, 255.toByte, 255.toByte, 255.toByte, 255.toByte))
  }

  test("decodePpm handles comments and mixed whitespace in the header") {
    val bytes =
      "P6 # a comment\n# another\n 2\t1 # trailing\n255\n".getBytes("US-ASCII") ++
        Array[Byte](1, 2, 3, 4, 5, 6)
    val img = ImageCodec.decodePpm(bytes)
    assert(img.width == 2 && img.height == 1)
    assert(img.rgb.toSeq == Seq[Byte](1, 2, 3, 4, 5, 6))
  }

  test("decodePpm rejects malformed payloads") {
    intercept[IllegalArgumentException](
      ImageCodec.decodePpm("P5\n1 1\n255\n ".getBytes("US-ASCII")))
    intercept[IllegalArgumentException]( // truncated pixel data
      ImageCodec.decodePpm("P6\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException]( // 16-bit maxval unsupported
      ImageCodec.decodePpm("P6\n1 1\n65535\n".getBytes("US-ASCII") ++ new Array[Byte](6)))
  }

  test("decodeBmp parses a hand-built 3x2 24-bit BMP (padding + bottom-up)") {
    // rows are BGR, padded to 4 bytes (3*3=9 -> 12), stored BOTTOM-UP:
    // stored row 0 = image row 1 (pixels D E F), stored row 1 = row 0 (A B C)
    def le(v: Int) = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val header =
      Array[Byte]('B', 'M') ++ le(54 + 24) ++ le(0) ++ le(54) ++ // file header
        le(40) ++ le(3) ++ le(2) ++ Array[Byte](1, 0, 24, 0) ++  // DIB
        le(0) ++ le(24) ++ le(0) ++ le(0) ++ le(0) ++ le(0)
    assert(header.length == 54)
    val rowDEF = Array[Byte](16, 15, 14, 26, 25, 24, 36, 35, 34, 0, 0, 0) // B,G,R + pad
    val rowABC = Array[Byte](13, 12, 11, 23, 22, 21, 33, 32, 31, 0, 0, 0)
    val img = ImageCodec.decodeBmp(header ++ rowDEF ++ rowABC)
    assert(img.width == 3 && img.height == 2)
    // canonical top-down RGB: A(11,12,13) B(21,22,23) C(31,32,33) / D E F
    assert(img.rgb.toSeq == Seq[Byte](
      11, 12, 13, 21, 22, 23, 31, 32, 33,
      14, 15, 16, 24, 25, 26, 34, 35, 36))
  }

  test("encode/decode round-trips are identity for both formats") {
    for ((w, h) <- Seq((1, 1), (3, 2), (9, 8), (17, 5), (143, 143))) {
      val rgb = Array.tabulate(3 * w * h)(i => ((i * 37 + 11) % 251).toByte)
      val img = Image(w, h, rgb)
      val p = ImageCodec.decodePpm(ImageCodec.encodePpm(img))
      assert(p.width == w && p.height == h && p.rgb.toSeq == rgb.toSeq, s"ppm ${w}x$h")
      val b = ImageCodec.decodeBmp(ImageCodec.encodeBmp(img))
      assert(b.width == w && b.height == h && b.rgb.toSeq == rgb.toSeq, s"bmp ${w}x$h")
    }
  }

  test("sniff routes by magic bytes") {
    val img = Image(2, 2, new Array[Byte](12))
    assert(ImageCodec.sniff(ImageCodec.encodePpm(img)).contains("ppm"))
    assert(ImageCodec.sniff(ImageCodec.encodeBmp(img)).contains("bmp"))
    assert(ImageCodec.sniff("hello".getBytes).isEmpty)
  }

  test("dhash64 bits are the adjacent-cell gradients (9x8 identity downsample)") {
    // at exactly 9x8 every dHash cell is a single pixel, so the expected
    // hash is a direct per-pixel comparison — independent of the box-
    // average machinery under test
    val w = 9; val h = 8
    val gray = Array.tabulate(h, w)((y, x) => ((x * 53 + y * 31 + 7) % 256))
    val rgb = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      rgb(3 * (y * w + x) + c) = gray(y)(x).toByte
    var expected = 0L
    for (b <- 0 until 64) {
      val (cy, cx) = (b / 8, b % 8)
      if (gray(cy)(cx + 1) > gray(cy)(cx)) expected |= 1L << b
    }
    assert(ImageCodec.dhash64(Image(w, h, rgb)) == expected)
  }

  test("realDecode quarantines malformed payloads instead of throwing") {
    // truncated PPM: valid magic + header, missing pixel bytes — the
    // decode slot must be TOTAL (one bad row can't kill a corpus job)
    val truncated = "P6\n4 4\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)
    val m = MultimodalOps.realDecode(MultimodalOps.MediaRow(7L, truncated))
    assert(m.format == "corrupt" && m.width == 0 && m.height == 0)
    assert(m.n_bytes == truncated.length && m.doc_id == 7L)
    // a BMP header lying about its size quarantines the same way
    val badBmp = ImageCodec.encodeBmp(Image(3, 2, new Array[Byte](18))).take(40)
    val mb = MultimodalOps.realDecode(MultimodalOps.MediaRow(8L, badBmp))
    assert(mb.format == "corrupt")
    // a GIF magic with a malformed body is REAL-but-corrupt since r10
    val badGif = MultimodalOps.realDecode(
      MultimodalOps.MediaRow(9L, "GIF89a....".getBytes("US-ASCII")))
    assert(badGif.format == "corrupt")
    // unknown magic quarantines as "unknown" — never a faked parse
    val unknown = MultimodalOps.realDecode(
      MultimodalOps.MediaRow(10L, "RIFF0000WEBP".getBytes("US-ASCII")))
    assert(unknown.format == "unknown" && unknown.width == 0 &&
      unknown.height == 0 && unknown.n_bytes == 12)
  }

  test("decodeGif inflates a hand-built LZW stream byte-for-byte") {
    // 2x2, 2-bit color table {black, red, green, blue}, pixel indices
    // 1,0,0,1 (red black / black red). LZW min code 2 => clear=4, eoi=5,
    // width starts at 3 bits and bumps to 4 when the dictionary reaches
    // 8 entries (after the second literal 0 adds entry 7). Code stream
    // [clear,1,0,0 @3b, 1,eoi @4b] packed LSB-first by a transparent
    // helper (no encoder under test involved).
    def pack(codes: Seq[(Int, Int)]): Array[Byte] = { // (code, width)
      var acc = 0L; var n = 0
      val out = scala.collection.mutable.ArrayBuffer[Byte]()
      for ((c, w) <- codes) {
        acc |= c.toLong << n; n += w
        while (n >= 8) { out += (acc & 0xff).toByte; acc >>>= 8; n -= 8 }
      }
      if (n > 0) out += (acc & 0xff).toByte
      out.toArray
    }
    val lzw = pack(Seq((4, 3), (1, 3), (0, 3), (0, 3), (1, 4), (5, 4)))
    val gif =
      "GIF89a".getBytes("US-ASCII") ++
        Array[Byte](2, 0, 2, 0,              // screen 2x2
          (0x80 | 0x01).toByte, 0, 0) ++     // GCT, 4 entries
        Array[Byte](0, 0, 0, -1, 0, 0, 0, -128, 0, 0, 0, -1) ++ // palette
        Array[Byte](0x2c, 0, 0, 0, 0, 2, 0, 2, 0, 0) ++          // descriptor
        Array[Byte](2) ++                      // LZW min code size
        Array[Byte](lzw.length.toByte) ++ lzw ++ Array[Byte](0) ++ // sub-blocks
        Array[Byte](0x3b)
    val img = ImageCodec.decodeGif(gif)
    assert(img.width == 2 && img.height == 2)
    assert(img.rgb.toSeq == Seq[Byte](
      -1, 0, 0, 0, 0, 0, 0, 0, 0, -1, 0, 0)) // red black / black red
    // routed through the common decode slot + realDecode
    assert(ImageCodec.sniff(gif).contains("gif"))
    val m = MultimodalOps.realDecode(MultimodalOps.MediaRow(1L, gif))
    assert(m.format == "gif" && m.width == 2 && m.height == 2)
  }

  test("decodeGif rejects malformed payloads as IllegalArgumentException") {
    // dictionary growth + clear handling on a longer run: 4x2 of a single
    // color exercises multi-code chains; build via repeated literals
    def gifOf(w: Int, h: Int, lzwBody: Array[Byte], interlace: Boolean = false) =
      "GIF89a".getBytes("US-ASCII") ++
        Array[Byte]((w & 0xff).toByte, 0, (h & 0xff).toByte, 0,
          (0x80 | 0x01).toByte, 0, 0) ++
        Array[Byte](0, 0, 0, -1, 0, 0, 0, -128, 0, 0, 0, -1) ++
        Array[Byte](0x2c, 0, 0, 0, 0, (w & 0xff).toByte, 0, (h & 0xff).toByte, 0,
          (if (interlace) 0x40 else 0).toByte) ++
        Array[Byte](2, lzwBody.length.toByte) ++ lzwBody ++ Array[Byte](0, 0x3b)
    def pack(codes: Seq[(Int, Int)]): Array[Byte] = {
      var acc = 0L; var n = 0
      val out = scala.collection.mutable.ArrayBuffer[Byte]()
      for ((c, w) <- codes) {
        acc |= c.toLong << n; n += w
        while (n >= 8) { out += (acc & 0xff).toByte; acc >>>= 8; n -= 8 }
      }
      if (n > 0) out += (acc & 0xff).toByte
      out.toArray
    }
    // too FEW pixels: stream ends after 2 of 8
    intercept[IllegalArgumentException](ImageCodec.decodeGif(
      gifOf(4, 2, pack(Seq((4, 3), (1, 3), (0, 3), (5, 3))))))
    // interlace flag rejected
    intercept[IllegalArgumentException](ImageCodec.decodeGif(
      gifOf(2, 2, pack(Seq((4, 3), (1, 3), (0, 3), (0, 3), (1, 3), (5, 3))),
        interlace = true)))
    // color index outside the table (code 3 valid LZW literal, 4-entry
    // table is fine — shrink the table claim instead: min code 2 demands
    // >= 4 colors, so craft an index via a VALID stream on a table whose
    // entries the stream exceeds is impossible here; instead: truncated
    // color table
    intercept[IllegalArgumentException](ImageCodec.decodeGif(
      "GIF89a".getBytes("US-ASCII") ++ Array[Byte](2, 0, 2, 0, 0x80.toByte, 0)))
    // code beyond the dictionary
    intercept[IllegalArgumentException](ImageCodec.decodeGif(
      gifOf(2, 2, pack(Seq((4, 3), (1, 3), (7, 3), (0, 3), (1, 3), (5, 3))))))
  }

  test("encodeGif round-trips pixel-exact across LZW stress shapes") {
    // shapes chosen to drive every encoder branch: single pixel (flush
    // only), constant runs (KwKwK code==next chains), 2-color (tabBits
    // clamped up to minCode 2), exactly-256-color (minCode 8), width-bump
    // boundaries, and a 128x128 pseudo-random frame whose dictionary
    // provably hits the 12-bit cap (16384 pixels, 256 colors)
    def gray(vs: Array[Int], w: Int, h: Int): Image = {
      val rgb = new Array[Byte](3 * w * h)
      for (i <- 0 until w * h) {
        rgb(3 * i) = vs(i).toByte; rgb(3 * i + 1) = vs(i).toByte
        rgb(3 * i + 2) = vs(i).toByte
      }
      Image(w, h, rgb)
    }
    val shapes = Seq(
      gray(Array(7), 1, 1),
      gray(Array.fill(64)(3), 8, 8),                       // one long run
      gray(Array.tabulate(64)(i => i % 2), 8, 8),          // ababab
      gray(Array.tabulate(256)(identity), 16, 16),         // 256 colors
      gray(Array.tabulate(333)(i => (i * i) % 5), 3, 111), // bump boundaries
      gray(Array.tabulate(16384)(i => (i * 2654435761L % 1000003L % 256).toInt),
        128, 128))                // dict cap -> mid-stream CLEAR + rebuild
    for (img <- shapes) {
      val bytes = ImageCodec.encodeGif(img)
      assert(ImageCodec.sniff(bytes).contains("gif"))
      val back = ImageCodec.decode(bytes) // via the common dispatch slot
      assert(back.width == img.width && back.height == img.height)
      assert(back.rgb.toSeq == img.rgb.toSeq,
        s"round trip ${img.width}x${img.height}")
      assert(bytes.last == 0x3b, "trailer")
    }
    // the cap case really does fill the dictionary: a stream that never
    // reaches 4096 entries stays under (4096-6) emitted codes; verify by
    // size arithmetic rather than reaching into encoder internals
    val big = ImageCodec.encodeGif(shapes.last)
    assert(big.length > 4096, "cap fixture too compressible to fill the table")
  }

  test("encodeGif round-trips the real fixture images and rejects unencodable inputs") {
    for (nb <- Seq(4, 9, 14, 19, 64, 129, 250)) {
      val img = MultimodalOps.buildImage(Array.tabulate(nb)(i => (i * 7 + 1).toByte))
      val back = ImageCodec.decodeGif(ImageCodec.encodeGif(img))
      assert(back.rgb.toSeq == img.rgb.toSeq, s"fixture nb=$nb")
    }
    // 257 distinct colors: reject loudly instead of quantizing silently
    val many = Image(257, 1, Array.tabulate(3 * 257)(i =>
      if (i % 3 == 0) (i / 3).toByte else if (i / 3 == 256) 1.toByte else 0.toByte))
    val e = intercept[IllegalArgumentException](ImageCodec.encodeGif(many))
    assert(e.getMessage.contains("256"))
    // dimensions must fit u16
    intercept[IllegalArgumentException](
      ImageCodec.encodeGif(Image(65536, 1, new Array[Byte](3 * 65536))))
  }

  test("crafted u16 GIF dimensions fail the MaxPixels area bound as IAE") {
    // Full-u16 builder (gifOf above writes the low byte only): header
    // dims are attacker-controlled, and per-dimension MaxDim can never
    // fire on u16 fields (65535 < 2^20) — the Long area bound must.
    def gifDims(w: Int, h: Int): Array[Byte] =
      "GIF89a".getBytes("US-ASCII") ++
        Array[Byte]((w & 0xff).toByte, ((w >> 8) & 0xff).toByte,
          (h & 0xff).toByte, ((h >> 8) & 0xff).toByte,
          (0x80 | 0x01).toByte, 0, 0) ++
        Array[Byte](0, 0, 0, -1, 0, 0, 0, -128, 0, 0, 0, -1) ++
        Array[Byte](0x2c, 0, 0, 0, 0,
          (w & 0xff).toByte, ((w >> 8) & 0xff).toByte,
          (h & 0xff).toByte, ((h >> 8) & 0xff).toByte, 0) ++
        Array[Byte](2, 0, 0x3b)
    // 65535x65535 wraps w*h negative as Int: pre-fix this surfaced as
    // NegativeArraySizeException, escaping the IAE-only quarantine.
    val e = intercept[IllegalArgumentException](
      ImageCodec.decodeGif(gifDims(65535, 65535)))
    assert(e.getMessage.contains("pixel count"))
    // A VALID near-max header (2^27 pixels, no Int wrap) must also reject
    // before the ~384 MiB rgb allocation, not OOM into it.
    intercept[IllegalArgumentException](
      ImageCodec.decodeGif(gifDims(16384, 8192)))
    // and the decode slot quarantines rather than dying
    val m = MultimodalOps.realDecode(
      MultimodalOps.MediaRow(7L, gifDims(65535, 65535)))
    assert(m.format == "corrupt")
  }

  test("crafted int32 header fields fail as IllegalArgumentException, not array errors") {
    def le(v: Int) = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val good = ImageCodec.encodeBmp(Image(3, 2, new Array[Byte](18)))
    def patched(off: Int, v: Int): Array[Byte] = {
      val b = good.clone(); le(v).copyToArray(b, off); b
    }
    // negative width: bmpRowSize(-1) = 0, so the old truncation require
    // passed and new Array[Byte](3*w*h) threw NegativeArraySizeException —
    // escaping the quarantine catch. Must be a require failure now.
    intercept[IllegalArgumentException](ImageCodec.decodeBmp(patched(18, -1)))
    // negative data offset: indexed out of bounds before the guard
    intercept[IllegalArgumentException](ImageCodec.decodeBmp(patched(10, -100)))
    // data offset past the end of the payload
    intercept[IllegalArgumentException](ImageCodec.decodeBmp(patched(10, good.length + 1)))
    // huge width whose Int products would wrap: must fail the MaxDim bound
    intercept[IllegalArgumentException](ImageCodec.decodeBmp(patched(18, 0x40000000)))
    // and every crafted variant quarantines through realDecode
    for (bad <- Seq(patched(18, -1), patched(10, -100), patched(18, 0x40000000))) {
      assert(MultimodalOps.realDecode(MultimodalOps.MediaRow(1L, bad)).format == "corrupt")
    }
    // PPM: a digit run that would wrap the int32 accumulator is rejected
    intercept[IllegalArgumentException](ImageCodec.decodePpm(
      "P6\n99999999999999999999 1\n255\n".getBytes("US-ASCII") ++ new Array[Byte](3)))
    intercept[IllegalArgumentException]( // zero-dimension header
      ImageCodec.decodePpm("P6\n0 4\n255\n".getBytes("US-ASCII")))
  }

  test("phash64 is total: malformed and undersized sniffing payloads fall back") {
    // magic sniffs as PPM but the body is truncated — must hash via the
    // stub fallback, not throw (the hash slot feeds the same corpus-scale
    // pipeline as the decode slot)
    val truncated = "P6\n4 4\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)
    assert(MultimodalOps.phash64(truncated) == MultimodalOps.stubPhash64(truncated))
    // a VALID image below dHash's 9x8 grid falls back the same way
    val tiny = ImageCodec.encodePpm(Image(2, 2, new Array[Byte](12)))
    assert(MultimodalOps.phash64(tiny) == MultimodalOps.stubPhash64(tiny))
    // while a decodable >= 9x8 image still hashes REAL pixels
    val ok = ImageCodec.encodePpm(Image(9, 8, Array.tabulate(216)(i => (i % 251).toByte)))
    assert(MultimodalOps.phash64(ok) == ImageCodec.dhash64(ImageCodec.decode(ok)))
  }

  test("boxDownsample averages exact integer cell boxes; thumbnails re-decode") {
    // 4x4 -> 2x2: each output cell is the mean of a 2x2 box, integer div
    val gray = Array(
      10, 20, 30, 40,
      50, 60, 70, 80,
      90, 100, 110, 120,
      130, 140, 151, 160)
    val rgb = new Array[Byte](48)
    for (i <- 0 until 16; c <- 0 until 3) rgb(3 * i + c) = gray(i).toByte
    val thumb = MultimodalOps.boxDownsample(Image(4, 4, rgb), 2, 2)
    // box means: (10+20+50+60)/4=35, (30+40+70+80)/4=55,
    //            (90+100+130+140)/4=115, (110+120+151+160)/4=135 (floor)
    assert(thumb.rgb.grouped(3).map(_(0) & 0xff).toSeq == Seq(35, 55, 115, 135))
    // uneven 5x3 -> 2x2 still covers every pixel exactly once
    val rgb2 = Array.tabulate(45)(i => ((i * 17 + 3) % 251).toByte)
    val t2 = MultimodalOps.boxDownsample(Image(5, 3, rgb2), 2, 2)
    assert(t2.width == 2 && t2.height == 2)
    // and the full thumbnail pipeline re-encodes a decodable image of the
    // planned dimensions in the input's own format
    val text = ("lorem ipsum dolor sit amet " * 40).trim.getBytes("UTF-8")
    val payload = MultimodalOps.buildPayload(text)
    val img = ImageCodec.decode(payload)
    val mx = math.max(img.width, img.height)
    assert(mx > 64, "fixture must need downsampling or the test is vacuous")
    val (ow, oh) = (img.width * 64 / mx, img.height * 64 / mx)
    val reEncoded =
      if (ImageCodec.sniff(payload).contains("bmp"))
        ImageCodec.encodeBmp(MultimodalOps.boxDownsample(img, ow, oh))
      else ImageCodec.encodePpm(MultimodalOps.boxDownsample(img, ow, oh))
    val back = ImageCodec.decode(reEncoded)
    assert(back.width == ow && back.height == oh)
  }

  // -------------------------------------------------------------- PNG

  /** Hand-built PNG: sig + IHDR + IDAT(s) (REAL deflate via stdlib
    * Deflater — exercises compressed streams, complementing encodePng's
    * stored blocks) + IEND, with genuine CRC32s.
    */
  private def be(v: Int) = Array[Byte](
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    be(data.length) ++ t ++ data ++ be(crc.getValue.toInt)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 128)
    var n = 0
    while (!d.finished()) n += d.deflate(buf, n, buf.length - n)
    d.end()
    java.util.Arrays.copyOf(buf, n)
  }

  private val pngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def pngOf(w: Int, h: Int, colorType: Int, raw: Array[Byte],
                    interlace: Int = 0, bitDepth: Int = 8,
                    idatSplit: Int = 0): Array[Byte] = {
    val ihdr = pngChunk("IHDR", be(w) ++ be(h) ++
      Array[Byte](bitDepth.toByte, colorType.toByte, 0, 0, interlace.toByte))
    val z = deflate(raw)
    val idats =
      if (idatSplit > 0 && idatSplit < z.length)
        pngChunk("IDAT", z.take(idatSplit)) ++ pngChunk("IDAT", z.drop(idatSplit))
      else pngChunk("IDAT", z)
    pngSig ++ ihdr ++ idats ++ pngChunk("IEND", Array.empty[Byte])
  }

  test("decodePng unfilters hand-built Sub/Up rows byte-for-byte") {
    // 2x2 truecolor. Row 0 Sub: (10,20,30) then +5 each -> (15,25,35).
    // Row 1 Up: row0 + (1,2,3 | 4,5,6) -> (11,22,33),(19,30,41).
    val raw = Array[Byte](
      1, 10, 20, 30, 5, 5, 5,
      2, 1, 2, 3, 4, 5, 6)
    val img = ImageCodec.decodePng(pngOf(2, 2, 2, raw))
    assert(img.width == 2 && img.height == 2)
    assert(img.rgb.toSeq == Seq[Byte](
      10, 20, 30, 15, 25, 35,
      11, 22, 33, 19, 30, 41))
  }

  test("decodePng unfilters hand-built Average/Paeth rows byte-for-byte") {
    // 2x2 truecolor. Row 0 Average (up=0): px0 = 100 (pred 0), px1 =
    // 10 + (100+0)/2 = 60. Row 1 Paeth: px0 pred = up = 100 -> 101;
    // px1: a=101 b=60 c=100, p=61 -> pb smallest -> pred 60 -> 62.
    val raw = Array[Byte](
      3, 100.toByte, 100.toByte, 100.toByte, 10, 10, 10,
      4, 1, 1, 1, 2, 2, 2)
    val img = ImageCodec.decodePng(pngOf(2, 2, 2, raw))
    assert(img.rgb.toSeq == Seq[Byte](
      100.toByte, 100.toByte, 100.toByte, 60, 60, 60,
      101.toByte, 101.toByte, 101.toByte, 62, 62, 62))
  }

  test("decodePng expands grayscale, drops alpha, concatenates split IDAT") {
    // grayscale 3x1, Sub filter: 7, 8, 9
    val gray = ImageCodec.decodePng(pngOf(3, 1, 0, Array[Byte](1, 7, 1, 1)))
    assert(gray.rgb.toSeq == Seq[Byte](7, 7, 7, 8, 8, 8, 9, 9, 9))
    // RGBA 2x1, None filter: alpha bytes dropped
    val rgba = ImageCodec.decodePng(pngOf(2, 1, 6,
      Array[Byte](0, 1, 2, 3, 99, 4, 5, 6, 98)))
    assert(rgba.rgb.toSeq == Seq[Byte](1, 2, 3, 4, 5, 6))
    // the same grayscale payload with its zlib stream split across two
    // IDAT chunks decodes identically (spec: IDAT data concatenates)
    val split = ImageCodec.decodePng(
      pngOf(3, 1, 0, Array[Byte](1, 7, 1, 1), idatSplit = 3))
    assert(split.rgb.toSeq == gray.rgb.toSeq)
  }

  test("decodePng rejects malformed and crafted payloads as IAE") {
    val ok = pngOf(2, 1, 2, Array[Byte](0, 1, 2, 3, 4, 5, 6))
    ImageCodec.decodePng(ok) // sanity: the base payload is valid
    // interlaced
    intercept[IllegalArgumentException](ImageCodec.decodePng(
      pngOf(2, 1, 2, Array[Byte](0, 1, 2, 3, 4, 5, 6), interlace = 1)))
    // 16-bit depth / palette color type
    intercept[IllegalArgumentException](ImageCodec.decodePng(
      pngOf(2, 1, 2, Array[Byte](0, 1, 2, 3, 4, 5, 6), bitDepth = 16)))
    intercept[IllegalArgumentException](ImageCodec.decodePng(
      pngOf(2, 1, 3, Array[Byte](0, 1, 2, 3, 4, 5, 6))))
    // flipped CRC byte
    val badCrc = ok.clone(); badCrc(badCrc.length - 1) = (badCrc.last ^ 1).toByte
    intercept[IllegalArgumentException](ImageCodec.decodePng(badCrc))
    // crafted dimensions: area bound fires in Long BEFORE allocation
    val e = intercept[IllegalArgumentException](ImageCodec.decodePng(
      pngOf(20000, 20000, 2, Array[Byte](0, 1, 2, 3, 4, 5, 6))))
    assert(e.getMessage.contains("pixel count"))
    intercept[IllegalArgumentException](ImageCodec.decodePng(
      pngOf(0, 1, 2, Array[Byte](0, 1, 2))))
    // deflate stream short / overlong vs the IHDR-implied size
    intercept[IllegalArgumentException](ImageCodec.decodePng(
      pngOf(2, 2, 2, Array[Byte](0, 1, 2, 3, 4, 5, 6)))) // one row for h=2
    intercept[IllegalArgumentException](ImageCodec.decodePng(
      pngOf(2, 1, 2, Array[Byte](0, 1, 2, 3, 4, 5, 6, 0, 9, 9, 9, 9, 9, 9))))
    // unknown filter type
    intercept[IllegalArgumentException](ImageCodec.decodePng(
      pngOf(2, 1, 2, Array[Byte](9, 1, 2, 3, 4, 5, 6))))
    // and the decode slot quarantines every one of them
    for (bad <- Seq(badCrc, pngOf(2, 1, 2, Array[Byte](9, 1, 2, 3, 4, 5, 6)))) {
      val m = MultimodalOps.realDecode(MultimodalOps.MediaRow(3L, bad))
      assert(m.format == "corrupt")
    }
  }

  test("encodePng round-trips and its byte count matches the analytic formula") {
    def check(w: Int, h: Int): Unit = {
      val rgb = Array.tabulate(3 * w * h)(i => ((i * 31 + 7) % 251).toByte)
      val img = Image(w, h, rgb)
      val bytes = ImageCodec.encodePng(img)
      assert(ImageCodec.sniff(bytes).contains("png"))
      val raw = h * (1 + 3 * w)
      val expected = 63 + 5 * ((raw + 65534) / 65535) + raw
      assert(bytes.length == expected,
        s"${w}x$h: got ${bytes.length}, analytic $expected")
      val back = ImageCodec.decodePng(bytes)
      assert(back.width == w && back.height == h)
      assert(java.util.Arrays.equals(back.rgb, rgb))
    }
    check(2, 2) // single stored block
    check(143, 143) // raw = 61,490: still one block
    check(170, 170) // raw = 86,870: TWO stored blocks
  }

  test("buildPayload encodes real images; near-identical texts collide in phash") {
    val base = ("the quick brown fox jumps over the lazy dog " * 8).trim
    val pa = MultimodalOps.buildPayload(base.getBytes("UTF-8"))
    // format rotates on byte length % 4: bmp / png / ppm / ppm
    val fmt = ImageCodec.sniff(pa)
    val expectFmt = base.length % 4 match {
      case 0 => "bmp"; case 1 => "png"; case _ => "ppm"
    }
    assert(fmt.contains(expectFmt))
    val img = ImageCodec.decode(pa)
    assert(img.width == 16 + (base.length / 16) % 128)
    assert(img.height == 16 + (base.length / 32) % 128)
    // a tail edit beyond the 128-byte sampling prefix, same length bucket:
    // pixel-identical image => phash Hamming 0
    val edited = base.dropRight(3) + "cat"
    assert(edited.length == base.length)
    val pb = MultimodalOps.buildPayload(edited.getBytes("UTF-8"))
    assert(java.lang.Long.bitCount(
      MultimodalOps.phash64(pa) ^ MultimodalOps.phash64(pb)) == 0)
    // rewriting the whole sampled prefix produces a different image —
    // phash moves far (a 3-char edit would NOT move it: that robustness
    // is the point of a perceptual hash)
    val front = (0 until 99).map(i => ('!' + (i * 7) % 90).toChar).mkString +
      base.drop(99)
    assert(front.length == base.length)
    val pc = MultimodalOps.buildPayload(front.getBytes("UTF-8"))
    assert(java.lang.Long.bitCount(
      MultimodalOps.phash64(pa) ^ MultimodalOps.phash64(pc)) > 3)
  }
}
