package graft.ops

/** Pure-JVM MJPEG-in-AVI container codec — the video lane's
  * [[AudioCodec]]/[[ImageCodec]] sibling, completing the multimodal
  * layer's last synthetic modality: a REAL RIFF form is written and
  * parsed (the same chunk grammar AudioCodec walks for WAV, one nesting
  * level deeper), and every frame payload is a REAL baseline JPEG
  * ([[JpegCodec]]) decoded through the full marker/Huffman/IDCT path.
  *
  * Layout (canonical minimal writer, tolerant reader — the classic
  * pre-OpenDML AVI 1.0 form, msdn AVIMAINHEADER/AVISTREAMHEADER/
  * BITMAPINFOHEADER field order):
  * {{{
  *   "RIFF" <fileSize-8 : u32le> "AVI "
  *     "LIST" <sz> "hdrl"
  *       "avih" <56> MicroSecPerFrame MaxBytesPerSec PaddingGranularity
  *                   Flags(0x10 HASINDEX) TotalFrames InitialFrames
  *                   Streams(1) SuggestedBufferSize Width Height
  *                   Reserved[4]
  *       "LIST" <sz> "strl"
  *         "strh" <56> fccType('vids') fccHandler('MJPG') Flags Priority
  *                     (u16) Language(u16) InitialFrames Scale Rate Start
  *                     Length SuggestedBufferSize Quality SampleSize
  *                     rcFrame{l,t,r,b : 4×u16}
  *         "strf" <40> biSize(40) biWidth biHeight biPlanes(1, u16)
  *                     biBitCount(24, u16) biCompression('MJPG')
  *                     biSizeImage biXPels biYPels biClrUsed biClrImportant
  *     "LIST" <sz> "movi"
  *       per frame: "00dc" <sz> <JPEG bytes> [pad byte if sz odd]
  *     "idx1" <16·n> per frame: "00dc" Flags(0x10 KEYFRAME)
  *                              offset-from-movi-list-start size
  * }}}
  *
  * Untrusted-header hardening (the [[ImageCodec.decodeBmp]] house rules):
  * every u32 field is bounds-checked, all size arithmetic runs in Long,
  * dimension/frame-count caps reject absurd headers outright, and every
  * malformed payload fails as IllegalArgumentException so the decode
  * slot's quarantine catch stays total. Unknown chunks and LISTs are
  * skipped the way a real reader must (odd sizes carry a pad byte).
  */
object AviCodec {

  /** Stream metadata from the parsed headers — everything [[MultimodalOps
    * .videoMeta]] reports, derived from avih/strh/strf, never from frame
    * payloads.
    */
  final case class AviMeta(
      width: Int, height: Int, rate: Int, scale: Int, nFrames: Int) {
    /** Integer frames-per-second; the canonical writer always uses
      * scale = 1. Exact only when scale divides rate.
      */
    def fps: Int = rate / scale
  }

  /** Full container content: video metadata + undecoded frame payloads +
    * the PCM audio stream when the file carries one ('auds' strl +
    * interleaved '01wb' chunks — [[encodeAviAv]] writes it,
    * [[decodeAviFull]] parses it).
    */
  final case class AviContent(
      meta: AviMeta, frames: IndexedSeq[Array[Byte]],
      audio: Option[AudioCodec.Audio])

  /** Caps for untrusted header fields (same role as
    * [[ImageCodec.MaxDim]]/[[ImageCodec.MaxPixels]]).
    */
  val MaxDim: Int = ImageCodec.MaxDim
  val MaxPixels: Long = ImageCodec.MaxPixels
  val MaxFrames: Int = 1 << 16
  val MaxRate: Int = 1 << 20
  /** Cap on total interleaved PCM bytes a header may declare. */
  val MaxAudioBytes: Long = 1L << 28

  private def putIntLE(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v & 0xff).toByte
    a(off + 1) = ((v >>> 8) & 0xff).toByte
    a(off + 2) = ((v >>> 16) & 0xff).toByte
    a(off + 3) = ((v >>> 24) & 0xff).toByte
  }

  private def putShortLE(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v & 0xff).toByte
    a(off + 1) = ((v >>> 8) & 0xff).toByte
  }

  private def putTag(a: Array[Byte], off: Int, t: String): Unit = {
    var i = 0
    while (i < 4) { a(off + i) = t.charAt(i).toByte; i += 1 }
  }

  private def getIntLE(a: Array[Byte], off: Int): Int =
    (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8) |
      ((a(off + 2) & 0xff) << 16) | ((a(off + 3) & 0xff) << 24)

  private def getShortLE(a: Array[Byte], off: Int): Int =
    (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8)

  private def tag(a: Array[Byte], off: Int): String =
    new String(a, off, 4, "US-ASCII")

  /** Encode pre-encoded JPEG frame payloads as a minimal MJPEG AVI.
    * Deterministic byte-for-byte (AviCodecSpec pins a hand-built file).
    */
  def encodeAvi(
      width: Int, height: Int, fps: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width >= 1 && width <= MaxDim && height >= 1 && height <= MaxDim,
      s"AVI: bad dimensions $width x $height")
    // canonical-writer invariants tighter than the tolerant reader's caps:
    // the output must round-trip through decodeAvi (MaxPixels), and rcFrame
    // carries u16 fields, so dims beyond 0xffff would truncate silently
    require(width.toLong * height <= MaxPixels,
      s"AVI: $width x $height exceeds MaxPixels")
    require(width <= 0xffff && height <= 0xffff,
      s"AVI: $width x $height exceeds rcFrame u16 range")
    require(fps >= 1 && fps <= MaxRate, s"AVI: bad fps $fps")
    require(frames.nonEmpty && frames.length <= MaxFrames,
      s"AVI: ${frames.length} frames")
    val n = frames.length
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val moviPayload = frames.map(f => 8L + f.length + (f.length & 1)).sum
    val moviSize = 4 + moviPayload
    val idx1Size = 16L * n
    val riffSize = 4L + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)
    require(riffSize + 8 <= Int.MaxValue, "AVI: file exceeds RIFF 1.0 bounds")
    val out = new Array[Byte]((riffSize + 8).toInt)
    var p = 0
    def chunkHeader(t: String, sz: Int): Unit = {
      putTag(out, p, t); putIntLE(out, p + 4, sz); p += 8
    }
    putTag(out, 0, "RIFF"); putIntLE(out, 4, riffSize.toInt)
    putTag(out, 8, "AVI "); p = 12
    chunkHeader("LIST", hdrlSize); putTag(out, p, "hdrl"); p += 4
    chunkHeader("avih", 56)
    putIntLE(out, p, 1000000 / fps)       // dwMicroSecPerFrame
    putIntLE(out, p + 4, 0)               // dwMaxBytesPerSec
    putIntLE(out, p + 8, 0)               // dwPaddingGranularity
    putIntLE(out, p + 12, 0x10)           // dwFlags: AVIF_HASINDEX
    putIntLE(out, p + 16, n)              // dwTotalFrames
    putIntLE(out, p + 20, 0)              // dwInitialFrames
    putIntLE(out, p + 24, 1)              // dwStreams
    putIntLE(out, p + 28, 0)              // dwSuggestedBufferSize
    putIntLE(out, p + 32, width)
    putIntLE(out, p + 36, height)
    // dwReserved[4] already zero
    p += 56
    chunkHeader("LIST", 4 + 64 + 48); putTag(out, p, "strl"); p += 4
    chunkHeader("strh", 56)
    putTag(out, p, "vids"); putTag(out, p + 4, "MJPG")
    putIntLE(out, p + 8, 0)               // dwFlags
    putShortLE(out, p + 12, 0)            // wPriority
    putShortLE(out, p + 14, 0)            // wLanguage
    putIntLE(out, p + 16, 0)              // dwInitialFrames
    putIntLE(out, p + 20, 1)              // dwScale
    putIntLE(out, p + 24, fps)            // dwRate
    putIntLE(out, p + 28, 0)              // dwStart
    putIntLE(out, p + 32, n)              // dwLength (frames)
    putIntLE(out, p + 36, 0)              // dwSuggestedBufferSize
    putIntLE(out, p + 40, -1)             // dwQuality (default)
    putIntLE(out, p + 44, 0)              // dwSampleSize
    putShortLE(out, p + 48, 0); putShortLE(out, p + 50, 0)     // rcFrame l,t
    putShortLE(out, p + 52, width); putShortLE(out, p + 54, height)
    p += 56
    chunkHeader("strf", 40)
    putIntLE(out, p, 40)                  // biSize
    putIntLE(out, p + 4, width)
    putIntLE(out, p + 8, height)
    putShortLE(out, p + 12, 1)            // biPlanes
    putShortLE(out, p + 14, 24)           // biBitCount
    putTag(out, p + 16, "MJPG")           // biCompression
    putIntLE(out, p + 20, 3 * width * height) // biSizeImage (uncompressed)
    // biXPels/biYPels/biClrUsed/biClrImportant already zero
    p += 40
    chunkHeader("LIST", moviSize.toInt)
    val moviListStart = p // offset of 'movi' tag — idx1 offsets are
    putTag(out, p, "movi"); p += 4 //      relative to this position
    val offsets = new Array[Int](n)
    var i = 0
    while (i < n) {
      offsets(i) = p - moviListStart
      chunkHeader("00dc", frames(i).length)
      System.arraycopy(frames(i), 0, out, p, frames(i).length)
      p += frames(i).length + (frames(i).length & 1) // even alignment
      i += 1
    }
    chunkHeader("idx1", idx1Size.toInt)
    i = 0
    while (i < n) {
      putTag(out, p, "00dc")
      putIntLE(out, p + 4, 0x10)          // AVIIF_KEYFRAME
      putIntLE(out, p + 8, offsets(i))
      putIntLE(out, p + 12, frames(i).length)
      p += 16
      i += 1
    }
    out
  }

  /** Encode an A/V file: MJPEG frames + an interleaved 16-bit PCM audio
    * stream ([[AudioCodec.Audio]] supplies the payload — the WAV lane's
    * clip type, muxed instead of wrapped). Canonical two-stream form:
    * a second 'strl' (strh 'auds' + 16-byte PCMWAVEFORMAT strf with the
    * MS PCM conventions dwScale = nBlockAlign, dwRate = nAvgBytesPerSec,
    * dwSampleSize = nBlockAlign, dwLength = sample-frames), and the
    * audio split into one '01wb' chunk per video frame, interleaved
    * 00dc/01wb the way a real muxer keeps streams seekable; idx1 indexes
    * both streams' chunks in file order. Deterministic byte-for-byte
    * (AviCodecSpec pins a hand-built A/V file).
    */
  def encodeAviAv(
      width: Int, height: Int, fps: Int,
      frames: Seq[Array[Byte]], audio: AudioCodec.Audio): Array[Byte] = {
    require(width >= 1 && width <= 0xffff && height >= 1 && height <= 0xffff,
      s"AVI: bad dimensions $width x $height")
    require(width.toLong * height <= MaxPixels,
      s"AVI: $width x $height exceeds MaxPixels")
    require(fps >= 1 && fps <= MaxRate, s"AVI: bad fps $fps")
    require(frames.nonEmpty && frames.length <= MaxFrames,
      s"AVI: ${frames.length} frames")
    require(audio.sampleRate >= 1 && audio.sampleRate <= AudioCodec.MaxRate,
      s"AVI: bad audio rate ${audio.sampleRate}")
    require(audio.channels <= AudioCodec.MaxChannels,
      s"AVI: ${audio.channels} channels")
    val n = frames.length
    val blockAlign = 2 * audio.channels
    val byteRate = audio.sampleRate * blockAlign
    val aFrames = audio.frames
    require(2L * audio.samples.length <= MaxAudioBytes, "AVI: audio too long")
    // even split of the audio across n interleaved '01wb' chunks: chunk i
    // carries sample-frames [aFrames·i/n, aFrames·(i+1)/n)
    def sliceStart(i: Int): Int = ((aFrames.toLong * i) / n).toInt
    val hdrlSize = 4 + (8 + 56) +
      (8 + 4 + (8 + 56) + (8 + 40)) + // video strl
      (8 + 4 + (8 + 56) + (8 + 16))   // audio strl (PCMWAVEFORMAT strf)
    val moviPayload =
      frames.map(f => 8L + f.length + (f.length & 1)).sum +
        (0 until n).map { i =>
          val b = (sliceStart(i + 1) - sliceStart(i)).toLong * blockAlign
          8L + b + (b & 1)
        }.sum
    val moviSize = 4 + moviPayload
    val idx1Size = 16L * (2 * n)
    val riffSize = 4L + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)
    require(riffSize + 8 <= Int.MaxValue, "AVI: file exceeds RIFF 1.0 bounds")
    val out = new Array[Byte]((riffSize + 8).toInt)
    var p = 0
    def chunkHeader(t: String, sz: Int): Unit = {
      putTag(out, p, t); putIntLE(out, p + 4, sz); p += 8
    }
    putTag(out, 0, "RIFF"); putIntLE(out, 4, riffSize.toInt)
    putTag(out, 8, "AVI "); p = 12
    chunkHeader("LIST", hdrlSize); putTag(out, p, "hdrl"); p += 4
    chunkHeader("avih", 56)
    putIntLE(out, p, 1000000 / fps)
    putIntLE(out, p + 12, 0x10)           // AVIF_HASINDEX
    putIntLE(out, p + 16, n)              // dwTotalFrames
    putIntLE(out, p + 24, 2)              // dwStreams
    putIntLE(out, p + 32, width)
    putIntLE(out, p + 36, height)
    p += 56
    // ---- video strl (same as encodeAvi) ----
    chunkHeader("LIST", 4 + 64 + 48); putTag(out, p, "strl"); p += 4
    chunkHeader("strh", 56)
    putTag(out, p, "vids"); putTag(out, p + 4, "MJPG")
    putIntLE(out, p + 20, 1)              // dwScale
    putIntLE(out, p + 24, fps)            // dwRate
    putIntLE(out, p + 32, n)              // dwLength
    putIntLE(out, p + 40, -1)             // dwQuality (default)
    putIntLE(out, p + 44, 0)              // dwSampleSize
    putShortLE(out, p + 52, width); putShortLE(out, p + 54, height)
    p += 56
    chunkHeader("strf", 40)
    putIntLE(out, p, 40)
    putIntLE(out, p + 4, width)
    putIntLE(out, p + 8, height)
    putShortLE(out, p + 12, 1)
    putShortLE(out, p + 14, 24)
    putTag(out, p + 16, "MJPG")
    putIntLE(out, p + 20, 3 * width * height)
    p += 40
    // ---- audio strl ----
    chunkHeader("LIST", 4 + 64 + 24); putTag(out, p, "strl"); p += 4
    chunkHeader("strh", 56)
    putTag(out, p, "auds")                // fccType; fccHandler stays 0
    putIntLE(out, p + 20, blockAlign)     // dwScale = nBlockAlign
    putIntLE(out, p + 24, byteRate)       // dwRate = nAvgBytesPerSec
    putIntLE(out, p + 32, aFrames)        // dwLength (sample-frames)
    putIntLE(out, p + 40, -1)             // dwQuality (default)
    putIntLE(out, p + 44, blockAlign)     // dwSampleSize
    p += 56
    chunkHeader("strf", 16)               // PCMWAVEFORMAT
    putShortLE(out, p, 1)                 // wFormatTag = PCM
    putShortLE(out, p + 2, audio.channels)
    putIntLE(out, p + 4, audio.sampleRate)
    putIntLE(out, p + 8, byteRate)
    putShortLE(out, p + 12, blockAlign)
    putShortLE(out, p + 14, 16)           // wBitsPerSample
    p += 16
    // ---- movi: interleaved 00dc / 01wb ----
    chunkHeader("LIST", moviSize.toInt)
    val moviListStart = p
    putTag(out, p, "movi"); p += 4
    val ids = new Array[String](2 * n)
    val offsets = new Array[Int](2 * n)
    val sizes = new Array[Int](2 * n)
    var i = 0
    while (i < n) {
      ids(2 * i) = "00dc"; offsets(2 * i) = p - moviListStart
      sizes(2 * i) = frames(i).length
      chunkHeader("00dc", frames(i).length)
      System.arraycopy(frames(i), 0, out, p, frames(i).length)
      p += frames(i).length + (frames(i).length & 1)
      val s0 = sliceStart(i); val s1 = sliceStart(i + 1)
      val ab = (s1 - s0) * blockAlign
      ids(2 * i + 1) = "01wb"; offsets(2 * i + 1) = p - moviListStart
      sizes(2 * i + 1) = ab
      chunkHeader("01wb", ab)
      var k = s0 * audio.channels
      while (k < s1 * audio.channels) {
        putShortLE(out, p, audio.samples(k) & 0xffff)
        p += 2; k += 1
      }
      p += ab & 1
      i += 1
    }
    chunkHeader("idx1", idx1Size.toInt)
    i = 0
    while (i < 2 * n) {
      putTag(out, p, ids(i))
      putIntLE(out, p + 4, if (ids(i) == "00dc") 0x10 else 0)
      putIntLE(out, p + 8, offsets(i))
      putIntLE(out, p + 12, sizes(i))
      p += 16
      i += 1
    }
    out
  }

  /** Magic sniff: RIFF/AVI container. */
  def sniff(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "AVI "

  /** Single-stream view of [[decodeAviFull]]: video metadata + frame
    * payloads (audio, if the file carries a stream, is parsed, validated
    * and dropped — the video_meta/frame_sample consumers are audio-blind
    * by contract).
    */
  def decodeAvi(bytes: Array[Byte]): (AviMeta, IndexedSeq[Array[Byte]]) = {
    val c = decodeAviFull(bytes)
    (c.meta, c.frames)
  }

  /** Parse the container: headers validated against the caps, movi walked
    * for the stream chunks (video payloads returned UNDECODED — callers
    * feed them to [[JpegCodec.decodeJpeg]] per sampled frame, so
    * header-only consumers like videoMeta never pay entropy decode),
    * idx1 (when present) cross-checked entry-for-entry (id, offset, size)
    * against the walked chunks of BOTH streams. Strict on the invariants
    * a well-formed writer guarantees: stream 0 vids/MJPG with dims
    * consistent across avih/strh/strf and frame count consistent across
    * avih/strh/movi; the optional stream 1 auds/PCM with strh
    * scale/rate/sampleSize matching the strf block-align/byte-rate and
    * '01wb' byte total matching the declared sample-frame length.
    */
  def decodeAviFull(bytes: Array[Byte]): AviContent = {
    require(bytes.length >= 24 && tag(bytes, 0) == "RIFF" &&
      tag(bytes, 8) == "AVI ", "not a RIFF/AVI payload")
    val riffSize = getIntLE(bytes, 4)
    require(riffSize >= 4 && 8L + riffSize <= bytes.length,
      s"AVI: RIFF size $riffSize overruns payload")
    var w = 0; var h = 0; var rate = 0; var scale = 0
    var totalFrames = -1; var strhLength = -1
    var nStreams = 0
    var haveAvih = false; var haveStrh = false; var haveStrf = false
    // audio stream state (nStreams == 2)
    var aChannels = 0; var aRate = 0; var aByteRate = 0
    var aBlockAlign = 0; var aLength = -1
    var haveAStrh = false; var haveAStrf = false
    var strlSeen = 0
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val audioChunks = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    // every indexed chunk (video AND audio) in file order, for idx1
    val chunkIds = scala.collection.mutable.ArrayBuffer.empty[String]
    val chunkPos = scala.collection.mutable.ArrayBuffer.empty[Int]
    val chunkSize = scala.collection.mutable.ArrayBuffer.empty[Int]
    var moviListStart = -1
    var idx1: Array[Byte] = null

    def walkHdrl(from: Int, to: Int): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val id = tag(bytes, pos)
        val sz = getIntLE(bytes, pos + 4)
        require(sz >= 0 && pos + 8L + sz <= to,
          s"AVI: chunk '$id' size $sz overruns hdrl")
        if (id == "avih") {
          require(sz >= 56, s"AVI: avih size $sz")
          nStreams = getIntLE(bytes, pos + 8 + 24)
          require(nStreams == 1 || nStreams == 2,
            s"AVI: $nStreams streams (supported: 1 video, optional audio)")
          totalFrames = getIntLE(bytes, pos + 8 + 16)
          w = getIntLE(bytes, pos + 8 + 32)
          h = getIntLE(bytes, pos + 8 + 36)
          require(w >= 1 && w <= MaxDim && h >= 1 && h <= MaxDim,
            s"AVI: bad dimensions $w x $h")
          require(w.toLong * h <= MaxPixels, s"AVI: $w x $h exceeds MaxPixels")
          require(totalFrames >= 1 && totalFrames <= MaxFrames,
            s"AVI: bad frame count $totalFrames")
          haveAvih = true
        } else if (id == "LIST" && sz >= 4 && tag(bytes, pos + 8) == "strl") {
          require(haveAvih, "AVI: strl before avih")
          require(strlSeen < nStreams,
            s"AVI: more strl lists than the $nStreams declared streams")
          walkStrl(pos + 12, pos + 8 + sz, strlSeen)
          strlSeen += 1
        }
        pos += 8 + sz + (sz & 1)
      }
    }

    def walkStrl(from: Int, to: Int, streamIdx: Int): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val id = tag(bytes, pos)
        val sz = getIntLE(bytes, pos + 4)
        require(sz >= 0 && pos + 8L + sz <= to,
          s"AVI: chunk '$id' size $sz overruns strl")
        if (id == "strh" && streamIdx == 0) {
          require(sz >= 56, s"AVI: strh size $sz")
          require(tag(bytes, pos + 8) == "vids",
            "AVI: stream 0 is not video")
          require(tag(bytes, pos + 12) == "MJPG",
            s"AVI: handler '${tag(bytes, pos + 12)}' not MJPG")
          scale = getIntLE(bytes, pos + 8 + 20)
          rate = getIntLE(bytes, pos + 8 + 24)
          strhLength = getIntLE(bytes, pos + 8 + 32)
          require(scale >= 1 && rate >= 1 && rate <= MaxRate,
            s"AVI: bad rate/scale $rate/$scale")
          // fps = rate/scale integer-divides to 0 when scale > rate — a
          // sub-1fps stream is outside the canonical-writer family; reject
          // rather than report fps=0
          require(scale <= rate,
            s"AVI: scale $scale > rate $rate (sub-1fps stream)")
          haveStrh = true
        } else if (id == "strf" && streamIdx == 0) {
          require(haveStrh, "AVI: strf before strh")
          require(sz >= 40, s"AVI: strf size $sz")
          require(getIntLE(bytes, pos + 8 + 4) == w &&
            getIntLE(bytes, pos + 8 + 8) == h,
            "AVI: strf dimensions disagree with avih")
          require(tag(bytes, pos + 8 + 16) == "MJPG",
            "AVI: strf compression not MJPG")
          haveStrf = true
        } else if (id == "strh" && streamIdx == 1) {
          require(sz >= 56, s"AVI: strh size $sz")
          require(tag(bytes, pos + 8) == "auds",
            "AVI: stream 1 is not audio")
          // MS PCM conventions: dwScale = nBlockAlign, dwRate =
          // nAvgBytesPerSec, dwLength = sample-frames, dwSampleSize =
          // nBlockAlign; cross-checked against strf below
          aBlockAlign = getIntLE(bytes, pos + 8 + 20)
          aByteRate = getIntLE(bytes, pos + 8 + 24)
          aLength = getIntLE(bytes, pos + 8 + 32)
          val sampleSize = getIntLE(bytes, pos + 8 + 44)
          require(aBlockAlign >= 1 && aByteRate >= 1,
            s"AVI: bad audio scale/rate $aBlockAlign/$aByteRate")
          require(aLength >= 0 && aLength.toLong * aBlockAlign <= MaxAudioBytes,
            s"AVI: audio length $aLength exceeds cap")
          require(sampleSize == aBlockAlign,
            s"AVI: audio sampleSize $sampleSize != blockAlign $aBlockAlign")
          haveAStrh = true
        } else if (id == "strf" && streamIdx == 1) {
          require(haveAStrh, "AVI: audio strf before strh")
          require(sz >= 16, s"AVI: audio strf size $sz")
          require(getShortLE(bytes, pos + 8) == 1,
            "AVI: audio format not PCM")
          aChannels = getShortLE(bytes, pos + 8 + 2)
          aRate = getIntLE(bytes, pos + 8 + 4)
          val byteRate = getIntLE(bytes, pos + 8 + 8)
          val blockAlign = getShortLE(bytes, pos + 8 + 12)
          val bits = getShortLE(bytes, pos + 8 + 14)
          require(aChannels >= 1 && aChannels <= AudioCodec.MaxChannels,
            s"AVI: $aChannels audio channels")
          require(aRate >= 1 && aRate <= AudioCodec.MaxRate,
            s"AVI: bad audio rate $aRate")
          require(bits == 16, s"AVI: $bits-bit audio (16-bit PCM only)")
          require(blockAlign == 2 * aChannels,
            s"AVI: blockAlign $blockAlign != 2 x $aChannels channels")
          require(blockAlign == aBlockAlign && byteRate == aByteRate,
            "AVI: audio strf disagrees with strh scale/rate")
          require(byteRate == aRate * blockAlign,
            s"AVI: byteRate $byteRate != rate x blockAlign")
          haveAStrf = true
        }
        pos += 8 + sz + (sz & 1)
      }
    }

    def walkMovi(from: Int, to: Int): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val id = tag(bytes, pos)
        val sz = getIntLE(bytes, pos + 4)
        require(sz >= 0 && pos + 8L + sz <= to,
          s"AVI: chunk '$id' size $sz overruns movi")
        // 00dc = compressed video, 00db = uncompressed-convention tag some
        // writers still use for JPEG frames — accept both, like a player;
        // 01wb = stream-1 audio data
        if (id == "00dc" || id == "00db") {
          require(frames.length < MaxFrames, "AVI: too many frame chunks")
          frames += java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + sz)
          chunkIds += id; chunkPos += pos; chunkSize += sz
        } else if (id == "01wb") {
          require(nStreams == 2 && haveAStrf,
            "AVI: audio chunk without an audio stream")
          audioChunks +=
            java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + sz)
          chunkIds += id; chunkPos += pos; chunkSize += sz
        }
        pos += 8 + sz + (sz & 1)
      }
    }

    var pos = 12
    val end = 8 + riffSize
    while (pos + 8 <= end) {
      val id = tag(bytes, pos)
      val sz = getIntLE(bytes, pos + 4)
      require(sz >= 0 && pos + 8L + sz <= end,
        s"AVI: chunk '$id' size $sz overruns payload")
      if (id == "LIST" && sz >= 4) {
        tag(bytes, pos + 8) match {
          case "hdrl" => walkHdrl(pos + 12, pos + 8 + sz)
          case "movi" =>
            require(haveAvih && haveStrh && haveStrf,
              "AVI: movi before complete headers")
            require(nStreams == 1 || (haveAStrh && haveAStrf),
              "AVI: movi before complete audio headers")
            moviListStart = pos + 8
            walkMovi(pos + 12, pos + 8 + sz)
          case _ => () // unknown LIST (INFO etc.) skipped
        }
      } else if (id == "idx1") {
        idx1 = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + sz)
      }
      pos += 8 + sz + (sz & 1)
    }
    require(haveAvih && haveStrh && haveStrf, "AVI: incomplete headers")
    require(moviListStart >= 0, "AVI: no movi list")
    require(frames.length == totalFrames,
      s"AVI: avih declares $totalFrames frames, movi carries ${frames.length}")
    require(strhLength == totalFrames,
      s"AVI: strh length $strhLength disagrees with avih $totalFrames")
    if (idx1 != null) {
      require(idx1.length == 16 * chunkIds.length,
        s"AVI: idx1 carries ${idx1.length / 16} entries for " +
          s"${chunkIds.length} stream chunks")
      var i = 0
      while (i < chunkIds.length) {
        require(tag(idx1, 16 * i) == chunkIds(i),
          s"AVI: idx1 entry $i id '${tag(idx1, 16 * i)}' disagrees with " +
            s"walked chunk '${chunkIds(i)}'")
        // offsets are relative to the 'movi' fourcc position in the
        // canonical form; some writers emit absolute file offsets — a
        // tolerant reader accepts either, but the entry must point at
        // THIS chunk's header
        val off = getIntLE(idx1, 16 * i + 8)
        require(off == chunkPos(i) - moviListStart || off == chunkPos(i),
          s"AVI: idx1 entry $i offset $off points at neither relative " +
            s"${chunkPos(i) - moviListStart} nor absolute ${chunkPos(i)}")
        require(getIntLE(idx1, 16 * i + 12) == chunkSize(i),
          s"AVI: idx1 entry $i size disagrees with chunk")
        i += 1
      }
    }
    val audio =
      if (nStreams == 1) {
        require(audioChunks.isEmpty, "AVI: audio chunks in a 1-stream file")
        None
      } else {
        val total = audioChunks.iterator.map(_.length.toLong).sum
        require(total == aLength.toLong * aBlockAlign,
          s"AVI: audio carries $total bytes, strh declares " +
            s"${aLength.toLong * aBlockAlign}")
        val data = new Array[Byte](total.toInt)
        var o = 0
        audioChunks.foreach { c =>
          System.arraycopy(c, 0, data, o, c.length); o += c.length
        }
        val samples = new Array[Short](data.length / 2)
        var k = 0
        while (k < samples.length) {
          samples(k) =
            ((data(2 * k) & 0xff) | ((data(2 * k + 1) & 0xff) << 8)).toShort
          k += 1
        }
        Some(AudioCodec.Audio(aRate, aChannels, samples))
      }
    AviContent(AviMeta(w, h, rate, scale, totalFrames), frames.toIndexedSeq,
      audio)
  }
}
