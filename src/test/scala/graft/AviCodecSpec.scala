package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AviCodec, ImageCodec, JpegCodec, MultimodalOps}

/** Byte-level ground truth for the MJPEG-in-AVI codec (the
  * AudioCodecSpec discipline one container level deeper): a hand-built
  * RIFF/AVI form is pinned byte-for-byte against the encoder, decode of
  * hand-built payloads returns the exact headers and frame chunks,
  * round-trips are identity, unknown chunks/LISTs are skipped, crafted
  * headers fail as IllegalArgumentException (the quarantine contract),
  * and the full fixture chain (buildVideoFrame → encodeJpeg → encodeAvi
  * → decodeAvi → decodeJpeg) reproduces the analytic DC-chain pixels.
  */
class AviCodecSpec extends AnyFunSuite {

  private def le32(v: Int) = Array[Byte](
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def tag(s: String) = s.getBytes("US-ASCII")

  /** Hand-assemble the minimal canonical AVI the encoder documents —
    * field for field from the scaladoc layout, independently of the
    * encoder's own arithmetic.
    */
  private def handBuilt(w: Int, h: Int, fps: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    val avih = tag("avih") ++ le32(56) ++
      le32(1000000 / fps) ++ le32(0) ++ le32(0) ++ le32(0x10) ++
      le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = tag("strh") ++ le32(56) ++
      tag("vids") ++ tag("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++ le32(frames.length) ++
      le32(0) ++ le32(-1) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val strf = tag("strf") ++ le32(40) ++
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      tag("MJPG") ++ le32(3 * w * h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strl = tag("LIST") ++ le32(4 + strh.length + strf.length) ++
      tag("strl") ++ strh ++ strf
    val hdrl = tag("LIST") ++ le32(4 + avih.length + strl.length) ++
      tag("hdrl") ++ avih ++ strl
    var off = 4 // frame offsets relative to the 'movi' tag position
    val chunks = frames.map { f =>
      val c = tag("00dc") ++ le32(f.length) ++ f ++
        (if (f.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
      val o = off; off += c.length
      (c, o)
    }
    val movi = tag("LIST") ++ le32(4 + chunks.map(_._1.length).sum) ++
      tag("movi") ++ chunks.flatMap(_._1)
    val idx1 = tag("idx1") ++ le32(16 * frames.length) ++
      frames.zip(chunks).flatMap { case (f, (_, o)) =>
        tag("00dc") ++ le32(0x10) ++ le32(o) ++ le32(f.length)
      }
    val body = tag("AVI ") ++ hdrl ++ movi ++ idx1
    tag("RIFF") ++ le32(body.length) ++ body
  }

  private def jpegFrame(w: Int, h: Int, v: Int): Array[Byte] = {
    val rgb = Array.fill(3 * w * h)(v.toByte)
    JpegCodec.encodeJpeg(ImageCodec.Image(w, h, rgb))
  }

  /** Hand-assemble the canonical TWO-stream (MJPEG + PCM) form the A/V
    * encoder documents, independently of its arithmetic: second strl
    * (strh 'auds' with the MS PCM conventions + 16-byte PCMWAVEFORMAT
    * strf), audio split into one '01wb' per video frame interleaved
    * 00dc/01wb, idx1 covering both streams in file order.
    */
  private def handBuiltAv(w: Int, h: Int, fps: Int, frames: Seq[Array[Byte]],
      audio: graft.ops.AudioCodec.Audio): Array[Byte] = {
    val n = frames.length
    val ba = 2 * audio.channels
    val byteRate = audio.sampleRate * ba
    val aF = audio.frames
    val avih = tag("avih") ++ le32(56) ++
      le32(1000000 / fps) ++ le32(0) ++ le32(0) ++ le32(0x10) ++
      le32(n) ++ le32(0) ++ le32(2) ++ le32(0) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strhV = tag("strh") ++ le32(56) ++
      tag("vids") ++ tag("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++ le32(n) ++
      le32(0) ++ le32(-1) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val strfV = tag("strf") ++ le32(40) ++
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      tag("MJPG") ++ le32(3 * w * h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strlV = tag("LIST") ++ le32(4 + strhV.length + strfV.length) ++
      tag("strl") ++ strhV ++ strfV
    val strhA = tag("strh") ++ le32(56) ++
      tag("auds") ++ le32(0) ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(ba) ++ le32(byteRate) ++ le32(0) ++ le32(aF) ++
      le32(0) ++ le32(-1) ++ le32(ba) ++
      le16(0) ++ le16(0) ++ le16(0) ++ le16(0)
    val strfA = tag("strf") ++ le32(16) ++
      le16(1) ++ le16(audio.channels) ++ le32(audio.sampleRate) ++
      le32(byteRate) ++ le16(ba) ++ le16(16)
    val strlA = tag("LIST") ++ le32(4 + strhA.length + strfA.length) ++
      tag("strl") ++ strhA ++ strfA
    val hdrl = tag("LIST") ++
      le32(4 + avih.length + strlV.length + strlA.length) ++
      tag("hdrl") ++ avih ++ strlV ++ strlA
    def slice(i: Int): Int = ((aF.toLong * i) / n).toInt
    var off = 4
    val chunks = (0 until n).flatMap { i =>
      val f = frames(i)
      val v = tag("00dc") ++ le32(f.length) ++ f ++
        (if (f.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
      val vo = off; off += v.length
      val pcm = (slice(i) * audio.channels until slice(i + 1) * audio.channels)
        .flatMap(k => le16(audio.samples(k) & 0xffff)).toArray
      val a = tag("01wb") ++ le32(pcm.length) ++ pcm
      val ao = off; off += a.length
      Seq(("00dc", v, vo, f.length), ("01wb", a, ao, pcm.length))
    }
    val movi = tag("LIST") ++ le32(4 + chunks.map(_._2.length).sum) ++
      tag("movi") ++ chunks.flatMap(_._2)
    val idx1 = tag("idx1") ++ le32(16 * chunks.length) ++
      chunks.flatMap { case (id, _, o, sz) =>
        tag(id) ++ le32(if (id == "00dc") 0x10 else 0) ++ le32(o) ++ le32(sz)
      }
    val body = tag("AVI ") ++ hdrl ++ movi ++ idx1
    tag("RIFF") ++ le32(body.length) ++ body
  }

  test("encodeAvi matches the hand-built canonical form byte-for-byte") {
    val frames = Seq(jpegFrame(16, 8, 40), jpegFrame(16, 8, 200))
    val got = AviCodec.encodeAvi(16, 8, 25, frames)
    val want = handBuilt(16, 8, 25, frames)
    assert(got.length == want.length,
      s"length ${got.length} vs hand-built ${want.length}")
    assert(java.util.Arrays.equals(got, want))
  }

  test("decodeAvi round-trips headers and frame payloads exactly") {
    val frames = (0 until 5).map(f => jpegFrame(24, 16, 30 * f + 10))
    val (m, fr) = AviCodec.decodeAvi(AviCodec.encodeAvi(24, 16, 12, frames))
    assert(m.width == 24 && m.height == 16 && m.fps == 12 && m.nFrames == 5)
    assert(fr.length == 5)
    for (i <- 0 until 5)
      assert(java.util.Arrays.equals(fr(i), frames(i)), s"frame $i")
  }

  test("odd-sized frame chunks carry a pad byte and still round-trip") {
    // craft an odd-length payload: append one byte past EOI — decodeAvi
    // must return it verbatim (the container does not parse frames)
    val odd = jpegFrame(8, 8, 99) :+ 0x55.toByte
    assume(odd.length % 2 == 1, "construct an odd payload")
    val (m, fr) = AviCodec.decodeAvi(AviCodec.encodeAvi(8, 8, 10, Seq(odd)))
    assert(m.nFrames == 1 && java.util.Arrays.equals(fr(0), odd))
  }

  test("unknown chunks and LISTs are skipped like a real player") {
    val frames = Seq(jpegFrame(8, 8, 77))
    val enc = AviCodec.encodeAvi(8, 8, 10, frames)
    // splice an unknown JUNK chunk between hdrl and movi
    val hdrlEnd = {
      // RIFF(12) + LIST header(8) + hdrl payload
      val hdrlSize = {
        val b = enc.slice(16, 20)
        (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 24)
      }
      20 + hdrlSize
    }
    val junk = tag("JUNK") ++ le32(6) ++ Array[Byte](1, 2, 3, 4, 5, 6)
    val spliced = enc.take(hdrlEnd) ++ junk ++ enc.drop(hdrlEnd)
    // fix the RIFF size field
    val fixed = spliced.clone()
    val newRiff = spliced.length - 8
    System.arraycopy(le32(newRiff), 0, fixed, 4, 4)
    val (m, fr) = AviCodec.decodeAvi(fixed)
    assert(m.nFrames == 1 && java.util.Arrays.equals(fr(0), frames(0)))
  }

  test("crafted headers are rejected as IllegalArgumentException") {
    val good = AviCodec.encodeAvi(8, 8, 10, Seq(jpegFrame(8, 8, 50)))
    def mutated(off: Int, v: Array[Byte]): Array[Byte] = {
      val b = good.clone(); System.arraycopy(v, 0, b, off, v.length); b
    }
    // wrong magic
    intercept[IllegalArgumentException] {
      AviCodec.decodeAvi(mutated(8, tag("WAVE")))
    }
    // RIFF size past the payload
    intercept[IllegalArgumentException] {
      AviCodec.decodeAvi(mutated(4, le32(good.length * 2)))
    }
    // absurd avih dimensions (width beyond MaxDim) — avih starts at
    // RIFF(12)+LIST hdr(8)+'hdrl'(4)=24; dwWidth at +8+32 inside avih
    intercept[IllegalArgumentException] {
      AviCodec.decodeAvi(mutated(24 + 8 + 32, le32(AviCodec.MaxDim + 1)))
    }
    // zero frames declared
    intercept[IllegalArgumentException] {
      AviCodec.decodeAvi(mutated(24 + 8 + 16, le32(0)))
    }
    // frame-count mismatch: declare 2 frames, movi carries 1 (strh
    // length must be mutated too or it fails there — both asserted)
    intercept[IllegalArgumentException] {
      AviCodec.decodeAvi(mutated(24 + 8 + 16, le32(2)))
    }
    // two streams
    intercept[IllegalArgumentException] {
      AviCodec.decodeAvi(mutated(24 + 8 + 24, le32(2)))
    }
    // truncated mid-movi (header intact, movi list overruns)
    intercept[IllegalArgumentException] {
      AviCodec.decodeAvi(good.take(good.length - 20))
    }
    // non-MJPG handler in strh — strh tag starts at 24+64(avih)+8+4=100,
    // fccHandler at +8+4
    intercept[IllegalArgumentException] {
      AviCodec.decodeAvi(mutated(100 + 8 + 4, tag("H264")))
    }
    // sub-1fps stream: scale > rate (strh data at 108; dwScale at +20)
    intercept[IllegalArgumentException] {
      AviCodec.decodeAvi(mutated(108 + 20, le32(11)))
    }
    // idx1 entry pointing at the wrong offset (single frame: idx1 data is
    // the last 16 bytes; dwChunkOffset at entry +8)
    intercept[IllegalArgumentException] {
      AviCodec.decodeAvi(mutated(good.length - 16 + 8, le32(12345)))
    }
    // idx1 entry id disagreeing with the walked chunk
    intercept[IllegalArgumentException] {
      AviCodec.decodeAvi(mutated(good.length - 16, tag("01wb")))
    }
    // empty payload and non-AVI RIFF
    intercept[IllegalArgumentException] { AviCodec.decodeAvi(Array[Byte]()) }
    assert(!AviCodec.sniff(Array[Byte](1, 2, 3)))
    assert(AviCodec.sniff(good))
  }

  test("encodeAviAv matches the hand-built two-stream form byte-for-byte") {
    val frames = Seq(jpegFrame(16, 8, 40), jpegFrame(16, 8, 200),
      jpegFrame(16, 8, 120))
    // 7 sample-frames across 3 chunks -> uneven 2/3/2 split; stereo
    val audio = graft.ops.AudioCodec.Audio(8000, 2,
      Array[Short](10, -10, 600, -600, 32767, -32768, 0, 5, 7, -7, 12, 13,
        -32000, 31000))
    val got = AviCodec.encodeAviAv(16, 8, 25, frames, audio)
    val want = handBuiltAv(16, 8, 25, frames, audio)
    assert(got.length == want.length,
      s"length ${got.length} vs hand-built ${want.length}")
    assert(java.util.Arrays.equals(got, want))
  }

  test("decodeAviFull round-trips A/V headers, frames, and every PCM sample") {
    val frames = (0 until 4).map(f => jpegFrame(8, 16, 20 * f + 5))
    val samples = Array.tabulate(2 * 333)(k => ((k * 37) % 65536 - 32768).toShort)
    val audio = graft.ops.AudioCodec.Audio(16000, 2, samples)
    val c = AviCodec.decodeAviFull(AviCodec.encodeAviAv(8, 16, 10, frames, audio))
    assert(c.meta.width == 8 && c.meta.height == 16 && c.meta.fps == 10 &&
      c.meta.nFrames == 4)
    for (i <- 0 until 4)
      assert(java.util.Arrays.equals(c.frames(i), frames(i)), s"frame $i")
    val a = c.audio.get
    assert(a.sampleRate == 16000 && a.channels == 2 && a.frames == 333)
    assert(java.util.Arrays.equals(a.samples, samples))
    // decodeAvi (the audio-blind view) accepts the same file
    val (m2, fr2) = AviCodec.decodeAvi(AviCodec.encodeAviAv(8, 16, 10, frames, audio))
    assert(m2.nFrames == 4 && fr2.length == 4)
    // and a 1-stream file reports no audio
    assert(AviCodec.decodeAviFull(
      AviCodec.encodeAvi(8, 8, 10, Seq(jpegFrame(8, 8, 50)))).audio.isEmpty)
  }

  test("crafted A/V headers are rejected as IllegalArgumentException") {
    val frames = Seq(jpegFrame(8, 8, 60))
    val audio = graft.ops.AudioCodec.Audio(8000, 1, Array[Short](1, 2, 3, 4))
    val good = AviCodec.encodeAviAv(8, 8, 10, frames, audio)
    def mutated(off: Int, v: Array[Byte]): Array[Byte] = {
      val b = good.clone(); System.arraycopy(v, 0, b, off, v.length); b
    }
    // fixed layout offsets: avih data at 32; video strl LIST at 88 (strh
    // data at 108, strf data at 172); audio strl LIST at 212 (strh data
    // at 232, strf data at 296)
    val aStrh = 232
    val aStrf = 296
    assert(new String(good, aStrh - 8, 4, "US-ASCII") == "strh")
    assert(new String(good, aStrf - 8, 4, "US-ASCII") == "strf")
    // non-PCM format tag
    intercept[IllegalArgumentException] {
      AviCodec.decodeAvi(mutated(aStrf, le16(2)))
    }
    // blockAlign disagreeing with channels
    intercept[IllegalArgumentException] {
      AviCodec.decodeAvi(mutated(aStrf + 12, le16(4)))
    }
    // 8-bit audio
    intercept[IllegalArgumentException] {
      AviCodec.decodeAvi(mutated(aStrf + 14, le16(8)))
    }
    // declared sample-frame length disagreeing with the '01wb' byte total
    intercept[IllegalArgumentException] {
      AviCodec.decodeAvi(mutated(aStrh + 32, le32(5)))
    }
    // strh sampleSize != blockAlign
    intercept[IllegalArgumentException] {
      AviCodec.decodeAvi(mutated(aStrh + 44, le32(1)))
    }
    // demote to 1 declared stream: the second strl becomes excess
    intercept[IllegalArgumentException] {
      AviCodec.decodeAvi(mutated(32 + 24, le32(1)))
    }
    // three declared streams: unsupported
    intercept[IllegalArgumentException] {
      AviCodec.decodeAvi(mutated(32 + 24, le32(3)))
    }
    // the unmutated file parses
    assert(AviCodec.decodeAviFull(good).audio.get.frames == 4)
  }

  test("idx1 with absolute file offsets (the other real-world convention) parses") {
    // some writers emit idx1 offsets from file start instead of from the
    // 'movi' fourcc; the tolerant reader accepts both as long as each
    // entry points at ITS chunk's header
    val frames = Seq(jpegFrame(8, 8, 30), jpegFrame(8, 8, 90))
    val enc = AviCodec.encodeAvi(8, 8, 10, frames)
    val fixed = enc.clone()
    // locate the movi LIST: walk top-level chunks from offset 12
    var pos = 12
    var moviTag = -1
    var idx1Pos = -1
    def le(off: Int) = (enc(off) & 0xff) | ((enc(off + 1) & 0xff) << 8) |
      ((enc(off + 2) & 0xff) << 16) | ((enc(off + 3) & 0xff) << 24)
    while (pos + 8 <= enc.length) {
      val id = new String(enc, pos, 4, "US-ASCII")
      val sz = le(pos + 4)
      if (id == "LIST" && new String(enc, pos + 8, 4, "US-ASCII") == "movi")
        moviTag = pos + 8
      if (id == "idx1") idx1Pos = pos + 8
      pos += 8 + sz + (sz & 1)
    }
    assert(moviTag > 0 && idx1Pos > 0)
    for (i <- 0 until frames.length) {
      val rel = le(idx1Pos + 16 * i + 8)
      System.arraycopy(le32(rel + moviTag), 0, fixed, idx1Pos + 16 * i + 8, 4)
    }
    val (m, fr) = AviCodec.decodeAvi(fixed)
    assert(m.nFrames == 2 && java.util.Arrays.equals(fr(1), frames(1)))
  }

  test("encodeAvi enforces the canonical-writer caps (always decodable)") {
    val f = Seq(Array[Byte](1, 2, 3))
    // beyond rcFrame's u16 range
    intercept[IllegalArgumentException] { AviCodec.encodeAvi(70000, 8, 10, f) }
    // legal per-dim but beyond MaxPixels — r12's writer emitted a file its
    // own decoder rejected
    intercept[IllegalArgumentException] {
      AviCodec.encodeAvi(8192, 8200, 10, f)
    }
    // the boundary itself encodes AND its own decoder accepts it
    val ok = AviCodec.encodeAvi(8192, 8192, 10, f)
    val (m, fr) = AviCodec.decodeAvi(ok)
    assert(m.width == 8192 && m.height == 8192 && fr.length == 1)
  }

  test("fixture chain reproduces the analytic DC-chain pixels per frame") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val tb = text.getBytes("UTF-8")
    val nb = tb.length
    val nFrames = 1 + nb % MultimodalOps.VideoMaxFrames
    val tx = 2 + (nb / 16) % 16
    val ty = 2 + (nb / 32) % 16
    val mm = math.min(math.max(nb, 1), 128)
    val frames = (0 until nFrames)
      .map(f => JpegCodec.encodeJpeg(MultimodalOps.buildVideoFrame(tb, f)))
    val avi = AviCodec.encodeAvi(8 * tx, 8 * ty,
      MultimodalOps.VideoFpsBase + nb % MultimodalOps.VideoFpsSpan, frames)
    val (m, fr) = AviCodec.decodeAvi(avi)
    assert(m.nFrames == nFrames && m.width == 8 * tx && m.height == 8 * ty)
    val qd = JpegCodec.QuantDc
    def dcChain(v: Int): Int = {
      val q = math.floor((v - 128.0) * 8.0 / qd + 0.5)
      val r = math.floor(q * qd / 8.0 + 0.5).toInt + 128
      math.min(255, math.max(0, r))
    }
    for (f <- 0 until nFrames) {
      val img = JpegCodec.decodeJpeg(fr(f))
      for (j <- 0 until ty; i <- 0 until tx) {
        val v = tb((j * tx + i + f) % mm) & 0xff
        val got = img.rgb(3 * ((j * 8) * img.width + i * 8)) & 0xff
        assert(got == dcChain(v), s"frame $f tile ($i,$j)")
      }
    }
    // temporal coherence: consecutive frames differ (shift is visible)
    assert(!java.util.Arrays.equals(fr(0), fr(1)))
  }
}
