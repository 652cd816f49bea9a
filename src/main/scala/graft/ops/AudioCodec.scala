package graft.ops

/** Pure-JVM WAV (RIFF / 16-bit PCM) codec — the audio lane's
  * [[ImageCodec]] twin, making the multimodal layer genuinely
  * multi-MODAL: real RIFF headers parsed and validated, real
  * little-endian PCM sample extraction, unknown chunks skipped the way
  * a real reader must (a LIST/INFO chunk before `data` is routine).
  * Malformed payloads fail as IllegalArgumentException so the decode
  * slot's quarantine catch ([[AudioOps]]) stays total — the
  * crafted-header discipline of [[ImageCodec.decodeBmp]]: every int32
  * field is untrusted, bounds-checked, and size arithmetic runs in Long.
  *
  * Layout (canonical minimal writer, tolerant reader):
  *   "RIFF" <fileSize-8 : u32le> "WAVE"
  *   "fmt " <16 : u32le> <1=PCM : u16le> <channels : u16le>
  *          <sampleRate : u32le> <byteRate : u32le>
  *          <blockAlign : u16le> <16 bits : u16le>
  *   "data" <dataBytes : u32le> <interleaved s16le samples>
  */
object AudioCodec {

  /** Canonical decoded clip: interleaved 16-bit samples, frame-major
    * (`samples.length == frames · channels`).
    */
  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short]) {
    require(channels > 0 && samples.length % channels == 0,
      s"${samples.length} samples not a multiple of $channels channels")
    def frames: Int = samples.length / channels
  }

  /** Bounds for untrusted header fields (same role as
    * [[ImageCodec.MaxDim]]): keep every derived product inside Long and
    * reject absurd headers outright.
    */
  val MaxRate: Int = 1 << 20
  val MaxChannels: Int = 64

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

  private def getIntLE(a: Array[Byte], off: Int): Int =
    (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8) |
      ((a(off + 2) & 0xff) << 16) | ((a(off + 3) & 0xff) << 24)

  private def getShortLE(a: Array[Byte], off: Int): Int =
    (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8)

  private def tag(a: Array[Byte], off: Int): String =
    new String(a, off, 4, "US-ASCII")

  def encodeWav(clip: Audio): Array[Byte] = {
    val dataBytes = 2 * clip.samples.length
    val out = new Array[Byte](44 + dataBytes)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putIntLE(out, 4, out.length - 8)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putIntLE(out, 16, 16)               // fmt chunk size
    putShortLE(out, 20, 1)              // PCM
    putShortLE(out, 22, clip.channels)
    putIntLE(out, 24, clip.sampleRate)
    putIntLE(out, 28, clip.sampleRate * clip.channels * 2) // byte rate
    putShortLE(out, 32, clip.channels * 2)                 // block align
    putShortLE(out, 34, 16)                                // bits/sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putIntLE(out, 40, dataBytes)
    var i = 0
    while (i < clip.samples.length) {
      putShortLE(out, 44 + 2 * i, clip.samples(i) & 0xffff)
      i += 1
    }
    out
  }

  def decodeWav(bytes: Array[Byte]): Audio = {
    require(bytes.length >= 44 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
      "not a RIFF/WAVE payload")
    // walk chunks: fmt must precede data; unknown chunks skipped
    var pos = 12
    var haveFmt = false
    var channels = 0
    var rate = 0
    while (pos + 8 <= bytes.length) {
      val id = tag(bytes, pos)
      val sz = getIntLE(bytes, pos + 4)
      require(sz >= 0 && pos + 8L + sz <= bytes.length,
        s"WAV: chunk '$id' size $sz overruns payload")
      if (id == "fmt ") {
        require(sz >= 16, s"WAV: fmt chunk size $sz")
        require(getShortLE(bytes, pos + 8) == 1, "WAV: only PCM supported")
        channels = getShortLE(bytes, pos + 10)
        require(channels >= 1 && channels <= MaxChannels, s"WAV: $channels channels")
        rate = getIntLE(bytes, pos + 12)
        require(rate >= 1 && rate <= MaxRate, s"WAV: bad sample rate $rate")
        require(getShortLE(bytes, pos + 22) == 16, "WAV: only 16-bit supported")
        haveFmt = true
      } else if (id == "data") {
        require(haveFmt, "WAV: data chunk before fmt")
        require(sz % 2 == 0, s"WAV: odd data size $sz")
        require(sz.toLong % (2L * channels) == 0,
          s"WAV: $sz data bytes not whole frames of $channels channels")
        val n = sz / 2
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) {
          samples(i) = getShortLE(bytes, pos + 8 + 2 * i).toShort
          i += 1
        }
        return Audio(rate, channels, samples)
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      pos += 8 + sz + (sz & 1)
    }
    throw new IllegalArgumentException("WAV: no data chunk")
  }

  /** Magic sniff: RIFF/WAVE container. */
  def sniff(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE"

  /** 64-bit energy-gradient fingerprint — the audio twin of
    * [[ImageCodec.dhash64]]: per-channel-agnostic |sample| energy summed
    * into 65 equal time blocks, one gradient bit per adjacent block pair
    * (bit set iff the later block is strictly louder). Integer sums and
    * comparisons only — bit-reproducible everywhere. Requires at least
    * 65 samples.
    */
  def ehash64(clip: Audio): Long = {
    val n = clip.samples.length
    require(n >= 65, "ehash needs >= 65 samples")
    val blocks = new Array[Long](65)
    var i = 0
    while (i < n) {
      val s = clip.samples(i)
      blocks((i.toLong * 65L / n).toInt) += math.abs(s.toLong)
      i += 1
    }
    var h = 0L
    var b = 0
    while (b < 64) {
      if (blocks(b + 1) > blocks(b)) h |= (1L << b)
      b += 1
    }
    h
  }
}
