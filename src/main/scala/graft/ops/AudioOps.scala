package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Tables

/** Audio lane of the multimodal layer — REAL end to end via the pure-JVM
  * [[AudioCodec]] (RIFF/WAV 16-bit PCM both directions), the
  * [[MultimodalOps]] image-lane discipline applied to a second modality:
  * fixtures are genuinely ENCODED per document (clip parameters and PCM
  * content derived deterministically from the text, so near-duplicate
  * texts yield near-duplicate audio), the decode slot genuinely PARSES
  * the RIFF container, and every downstream op reports DECODED header
  * facts. The plan shape is the multimodal contract: binary column in,
  * `mapPartitions` decode (one decoder init per partition, no shuffle),
  * small typed rows out — a deployment swaps the codec body (mp3/flac
  * would need native libs) without touching any query.
  */
object AudioOps {

  final case class AudioRow(doc_id: Long, payload: Array[Byte])

  /** Typed decode output; a malformed payload quarantines as all-zero
    * fields with `status = "corrupt"` ([[MultimodalOps.realDecode]]'s
    * totality contract).
    */
  final case class AudioMeta(
      doc_id: Long, n_bytes: Int, sample_rate: Int, channels: Int,
      frames: Int, status: String)

  /** Deterministic clip for a document: rate/channels/frames bucket off
    * QUANTIZED byte length (/64, /32, /16 — the [[MultimodalOps.buildImage]]
    * discipline, so near-dup texts whose lengths differ by a few chars
    * usually share exact clip geometry), and PCM content samples the
    * first 128 text bytes in 16-sample blocks — documents sharing a long
    * prefix (the planted near-dup shape) produce near-identical
    * WAVEFORMS, which is what makes the fingerprint dedup over these
    * fixtures a real test.
    */
  private[graft] def buildClip(textBytes: Array[Byte]): AudioCodec.Audio = {
    val nb = textBytes.length
    val rate = ((nb / 64) % 3) match { case 0 => 8000; case 1 => 16000; case _ => 44100 }
    val channels = 1 + (nb / 32) % 2
    val frames = 256 + ((nb / 16) * 31) % 2048
    val m = math.min(math.max(nb, 1), 128)
    val samples = new Array[Short](frames * channels)
    var k = 0
    while (k < samples.length) {
      val v = if (nb == 0) 0 else ((textBytes((k / 16) % m) & 0xff) - 128) * 200
      samples(k) = v.toShort
      k += 1
    }
    AudioCodec.Audio(rate, channels, samples)
  }

  private[graft] def buildPayload(textBytes: Array[Byte]): Array[Byte] =
    AudioCodec.encodeWav(buildClip(textBytes))

  /** documents → genuinely encoded WAV payloads, partition-wise. */
  def audioPayloads(spark: SparkSession, dir: String): Dataset[AudioRow] = {
    import spark.implicits._
    // NOT balanced (r17): WAV/PCM encode has no entropy coding — the
    // per-row work is too cheap to buy back a repartition (A/B: 0.18 →
    // 0.35 s with balanced; contrast the JPEG/AVI slots, where it pays)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      .as[AudioRow]
      .mapPartitions(_.map(r => AudioRow(r.doc_id, buildPayload(r.payload))))
  }

  /** TOTAL decode slot: parse the RIFF container; malformed payloads
    * quarantine instead of throwing (one bad row never kills a
    * corpus-sized job).
    */
  def realDecode(r: AudioRow): AudioMeta =
    try {
      val a = AudioCodec.decodeWav(r.payload)
      AudioMeta(r.doc_id, r.payload.length, a.sampleRate, a.channels,
        a.frames, "ok")
    } catch {
      case _: IllegalArgumentException =>
        AudioMeta(r.doc_id, r.payload.length, 0, 0, 0, "corrupt")
    }

  def decoded(spark: SparkSession, dir: String): Dataset[AudioMeta] = {
    import spark.implicits._
    audioPayloads(spark, dir).mapPartitions(_.map(realDecode))
  }

  /** Per-(rate, channels) clip stats over DECODED headers — duration,
    * byte and frame totals; the oracle re-derives the exact RIFF byte
    * layout (44-byte header + 2·frames·channels PCM bytes) from the
    * document text, so a decode that misreads any header field
    * hash-mismatches. The one IEEE division chain sits at the boundary
    * and is mirrored shape-for-shape in the oracle.
    */
  def audioMeta(spark: SparkSession, dir: String): DataFrame =
    decoded(spark, dir).toDF()
      .groupBy(col("sample_rate"), col("channels"))
      .agg(
        count(lit(1)).as("n_clips"),
        sum(col("n_bytes").cast(LongType)).as("sum_bytes"),
        sum(col("frames").cast(LongType)).as("sum_frames"),
        (sum(col("frames").cast(LongType)).cast(DoubleType) * lit(1000)
          / col("sample_rate") / count(lit(1))).as("avg_duration_ms"))

  /** 2:1 decimation in the decode slot — REAL sample work: decode,
    * keep every even-indexed frame (all channels), re-encode, and
    * report the decoded input geometry plus the re-encoded output's
    * ACTUAL byte length (so both codec directions execute per row).
    * Oracle re-derives every field from the fixture layout:
    * out_frames = ceil(frames/2), out_bytes = 44 + 2·out_frames·chans.
    */
  def audioResample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    audioPayloads(spark, dir)
      .mapPartitions(_.map { r =>
        try {
          val a = AudioCodec.decodeWav(r.payload)
          val outFrames = (a.frames + 1) / 2
          val out = new Array[Short](outFrames * a.channels)
          var f = 0
          while (f < outFrames) {
            var c = 0
            while (c < a.channels) {
              out(f * a.channels + c) = a.samples(2 * f * a.channels + c)
              c += 1
            }
            f += 1
          }
          val encoded = AudioCodec.encodeWav(
            AudioCodec.Audio(math.max(a.sampleRate / 2, 1), a.channels, out))
          (r.doc_id, a.sampleRate, math.max(a.sampleRate / 2, 1),
            a.frames, outFrames, encoded.length)
        } catch {
          // the realDecode totality contract: one malformed payload
          // quarantines as an all-zero row, never kills the job
          case _: IllegalArgumentException => (r.doc_id, 0, 0, 0, 0, 0)
        }
      })
      .toDF("doc_id", "sample_rate", "out_rate", "in_frames", "out_frames",
        "out_bytes")
  }

  /** VAD frame size in interleaved samples. 256 = 16 of [[buildClip]]'s
    * 16-sample constant blocks, so a window's energy is analytically
    * derivable from 16 text bytes — which is what lets the oracle replay
    * a genuinely PCM-computed statistic.
    */
  val VadWindow = 256

  /** Energy gate for [[audioVad]]: a window is "active" when its summed
    * squared-sample energy exceeds this. 19.2e9 = 640000·30000, i.e. a
    * mean squared sample of 30000/16·200² — on the fixture waveform
    * (samples = (byte−128)·200) this splits space-heavy windows (|c| =
    * 96) from letter-only windows (|c| ≤ 31), so both classes occur.
    * Public so the oracle SQL interpolates THIS value.
    */
  val VadThresholdEnergy = 19200000000L

  /** Voice-activity-style energy gating over the DECODED waveform — the
    * census a speech-data pipeline runs to drop silence-dominated clips
    * before paying for transcription: per clip, fixed
    * [[VadWindow]]-sample windows are scored by exact integer energy
    * Σ v² and gated at [[VadThresholdEnergy]]; the release is the window
    * census (count, active count, exact total energy) plus the one
    * boundary division `active_frac`. The Spark side genuinely decodes
    * the RIFF container and walks real PCM samples ([[realDecode]]'s
    * quarantine contract for malformed payloads); the oracle replays the
    * identical integers analytically from the fixture's
    * text-byte→sample law (the video_frame_sample discipline), so a
    * decoder that misreads any sample hash-mismatches. The trailing
    * partial window (< [[VadWindow]] samples) is EXCLUDED by both sides.
    *
    * Scale: pure per-row map in the decode slot — zero exchanges, zero
    * joins; 100 TB of audio costs one scan and the census rides the
    * row.
    */
  def audioVad(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    audioPayloads(spark, dir)
      .mapPartitions(_.map { r =>
        try {
          val a = AudioCodec.decodeWav(r.payload)
          val s = a.samples
          val nWin = s.length / VadWindow
          var wI = 0
          var nAct = 0
          var sumE = 0L
          while (wI < nWin) {
            var k = wI * VadWindow
            val end = k + VadWindow
            var e = 0L
            while (k < end) { val v = s(k).toLong; e += v * v; k += 1 }
            sumE += e
            if (e > VadThresholdEnergy) nAct += 1
            wI += 1
          }
          (r.doc_id, a.sampleRate, nWin, nAct, sumE, "ok")
        } catch {
          case _: IllegalArgumentException =>
            (r.doc_id, 0, 0, 0, 0L, "corrupt")
        }
      })
      .toDF("doc_id", "sample_rate", "n_windows", "n_active", "sum_energy",
        "status")
      .select(
        col("doc_id"), col("sample_rate"), col("n_windows"),
        col("n_active"), col("sum_energy"),
        when(col("n_windows") =!= 0,
          col("n_active").cast(DoubleType)
            / col("n_windows").cast(DoubleType)).as("active_frac"),
        col("status"))
  }

  /** TOTAL fingerprint slot: energy-gradient hash of the DECODED PCM;
    * malformed or too-short clips fall back to the byte-histogram stub
    * (the [[MultimodalOps.phash64]] contract).
    */
  def fingerprint64(payload: Array[Byte]): Long =
    if (AudioCodec.sniff(payload))
      try AudioCodec.ehash64(AudioCodec.decodeWav(payload))
      catch { case _: IllegalArgumentException => MultimodalOps.stubPhash64(payload) }
    else MultimodalOps.stubPhash64(payload)

  /** Audio near-duplicate pairs over the media column — the
    * [[MultimodalOps.mediaPhashDedup]] banding discipline on the energy
    * hash: 4×16-bit bands, candidates only from shared-band equi-join
    * buckets (ids+bands through the shuffle, never PCM), exact
    * `bit_count(xor)` verify at Hamming ≤ 3 — pigeonhole-exact for that
    * radius. Rows-only (bit-level hash output); AudioCodecSpec pins the
    * banded pair set against a brute-force all-pairs scan plus planted
    * near-dup recall.
    */
  def audioFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fp = Tables.ckpt(
      audioPayloads(spark, dir)
        .mapPartitions(_.map(r => (r.doc_id, fingerprint64(r.payload))))
        .toDF("doc_id", "ehash"))
    val banded = fp.select(col("doc_id"), expr(
      """explode(array(
        |  named_struct('band_id', 0, 'band_val', ehash & 65535),
        |  named_struct('band_id', 1, 'band_val', shiftright(ehash, 16) & 65535),
        |  named_struct('band_id', 2, 'band_val', shiftright(ehash, 32) & 65535),
        |  named_struct('band_id', 3, 'band_val', shiftright(ehash, 48) & 65535)))"""
        .stripMargin).as("b"))
      .select(col("doc_id"), col("b.band_id"), col("b.band_val"))
    val x = banded.alias("x")
    val y = banded.alias("y")
    x.join(y,
        col("x.band_id") === col("y.band_id") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .join(fp.select(col("doc_id").as("doc_a"), col("ehash").as("h_a")), "doc_a")
      .join(fp.select(col("doc_id").as("doc_b"), col("ehash").as("h_b")), "doc_b")
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= 3)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
