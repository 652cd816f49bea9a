package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Tables

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, decoded partition-wise (BASELINE.json north star).
  *
  * Since round 9 the image lane is REAL end to end for codec-free
  * formats: fixtures are genuinely ENCODED (binary PPM or uncompressed
  * 24-bit BMP via [[ImageCodec]], pixel content derived deterministically
  * from the document text so near-duplicate texts yield near-duplicate
  * images), and the decode slot genuinely PARSES the payload — header
  * validation, padding, bottom-up row order and all. Round 10 added
  * DECODE-ONLY GIF (variable-width LZW inflation,
  * [[ImageCodec.decodeGif]]); round 11 makes PNG real BOTH directions
  * (stdlib-Inflater decode of filters 0–4 / color types 0/2/6, and a
  * stored-deflate encoder whose byte count stays oracle-analytic) and
  * rotates fixtures PPM/BMP/PNG on the `nb % 4` slot. Width/height/
  * format in every downstream op come from the decoded header, not from
  * a length heuristic. Round 11 also makes JPEG real — baseline BOTH
  * directions and progressive (SOF2) decode ([[JpegCodec]] —
  * FDCT/Huffman encode, full marker/entropy/multi-scan decode;
  * [[jpegFeatures]] proves the lossy chain against an analytic oracle).
  * Round 13 removed the last stand-in (`stubDecode`, which faked a
  * header parse for unsniffable payloads): every fixture format now has
  * a REAL pure-JVM codec, and a payload with unknown magic quarantines
  * as `format = "unknown"` — the dead-letter behavior a real pipeline
  * wants, not a fake parse (a deployment routes those to ImageIO/ffmpeg).
  * The plan shape — binary
  * column in, `mapPartitions` decode (one decoder init per partition, no
  * shuffle), small typed metadata rows out — is identical either way, so
  * a deployment swaps the decoder body without touching any query.
  */
object MultimodalOps {

  /** Opaque media payload. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Typed metadata produced by the decoder. */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Int, width: Int, height: Int, format: String)

  /** Deterministic image content for a document: dimensions bucket off
    * the text byte length (16..143 px a side — small enough to encode
    * per row, large enough that resize targets straddle); pixels are a
    * 16×16 piecewise-constant block grid whose values sample the first
    * 128 text bytes, so documents sharing a long prefix (the planted
    * near-dup shape) produce near-identical IMAGES — which is what makes
    * perceptual-hash dedup over these fixtures a real test. Dimensions
    * quantize by /16 and /32 so near-dup texts (lengths differing by a
    * few chars) usually share exact dimensions.
    */
  private[graft] def buildImage(textBytes: Array[Byte]): ImageCodec.Image = {
    val nb = textBytes.length
    val w = 16 + (nb / 16) % 128
    val h = 16 + (nb / 32) % 128
    val m = math.min(math.max(nb, 1), 128)
    val rgb = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      val by = y * 16 / h
      var x = 0
      while (x < w) {
        val v: Byte =
          if (nb == 0) 0 else textBytes((by * 16 + x * 16 / w) % m)
        val p = 3 * (y * w + x)
        rgb(p) = v; rgb(p + 1) = v; rgb(p + 2) = v
        x += 1
      }
      y += 1
    }
    ImageCodec.Image(w, h, rgb)
  }

  /** Deterministic REAL encoding of a document's image, rotating on
    * `nb % 4`: BMP at 0, PNG at 1 (stored-deflate zlib — byte count an
    * exact analytic function of the dimensions, see
    * [[ImageCodec.encodePng]]), PPM otherwise — all three decoders get
    * exercised by every corpus.
    */
  private[graft] def buildPayload(textBytes: Array[Byte]): Array[Byte] = {
    val img = buildImage(textBytes)
    textBytes.length % 4 match {
      case 0 => ImageCodec.encodeBmp(img)
      case 1 => ImageCodec.encodePng(img)
      case _ => ImageCodec.encodePpm(img)
    }
  }

  /** The phash fixture's OWN rotation, widened with GIF (r14): phash is
    * a function of DECODED pixels and every codec here is lossless, so
    * rotating formats cannot move a single hash bit — which is exactly
    * why [[ImageCodec.encodeGif]] joins THIS mix (every corpus now
    * exercises real LZW both directions in-pipeline) while the
    * byte-hashing oracles (multimodal_meta's sum_bytes, media_thumbnail's
    * out_bytes) keep [[buildPayload]]'s byte-analytic nb%4 rotation —
    * an adaptive-LZW byte count is content-dependent and has no SQL
    * twin. The fixture's grayscale images carry ≤ 128 distinct colors,
    * so the 256-color encode gate never fires here.
    */
  private[graft] def buildPhashPayload(textBytes: Array[Byte]): Array[Byte] =
    if (textBytes.length % 5 == 4) ImageCodec.encodeGif(buildImage(textBytes))
    else buildPayload(textBytes)

  /** documents → genuinely encoded binary media payloads. Encoding runs
    * partition-wise; only (id, bytes) rows exist, never a driver copy.
    */
  def mediaPayloads(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    // NOT balanced (r17): every consumer of this frame (multimodal_meta,
    // media_resize/thumbnail, image_features) benches ≤0.23 s — the
    // ImageCodec slot is too cheap to buy back a repartition. The
    // JPEG/AVI entropy-coding slots (videoPayloads, jpegFeatures,
    // videoMeta, avSyncCheck) ARE balanced: 1.4-1.65 → ~0.33 s each.
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      .as[MediaRow]
      .mapPartitions(_.map(r => MediaRow(r.doc_id, buildPayload(r.payload))))
  }

  /** REAL decoder for the formats [[ImageCodec]] covers: sniffs the
    * magic bytes, parses the header, and reports the DECODED dimensions.
    * Unknown magic quarantines as `format = "unknown"` with zero
    * dimensions — the same dead-letter posture as `corrupt`, never a
    * faked parse (r13 removed the stub that used to stand in here).
    *
    * TOTAL by contract: a payload whose magic matches but whose body is
    * malformed (truncated pixel data, bad header) quarantines as
    * `format = "corrupt"` with zero dimensions instead of throwing — one
    * bad row must never kill a corpus-sized decode job (the try_funcs /
    * dead-letter discipline applied to the decode slot). Every decode-slot
    * quarantine in this file catches the SAME set —
    * IllegalArgumentException | NoSuchElementException — so the totality
    * contract is uniform across realDecode / mediaThumbnail /
    * imageFeatures / phash64 (r10 advice: the narrower IAE-only catches
    * made the claim weaker than the code at some sites).
    */
  def realDecode(r: MediaRow): MediaMeta = ImageCodec.sniff(r.payload) match {
    case Some(fmt) =>
      try {
        val img = ImageCodec.decode(r.payload)
        MediaMeta(r.doc_id, r.payload.length, img.width, img.height, fmt)
      } catch {
        case _: IllegalArgumentException | _: NoSuchElementException =>
          MediaMeta(r.doc_id, r.payload.length, 0, 0, "corrupt")
      }
    case None => MediaMeta(r.doc_id, r.payload.length, 0, 0, "unknown")
  }

  /** encoded payloads → partition-wise REAL decode. */
  def decoded(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    // batch boundary: one decoder init per partition
    mediaPayloads(spark, dir).mapPartitions(_.map(realDecode))
  }

  /** Per-format media stats over the decoded metadata. */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    decoded(spark, dir).toDF()
      .groupBy(col("format"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes").cast(LongType)).as("sum_bytes"),
        sum(col("width").cast(LongType) * col("height").cast(LongType))
          .as("sum_pixels"),
        (sum(col("n_bytes").cast(LongType)).cast(DoubleType) / count(lit(1)))
          .as("avg_bytes"))

  /** Resize planning: map DECODED dimensions to a target box (max side
    * 64 — a thumbnail pass; the 16..143 px fixtures straddle it so both
    * CASE branches execute), aspect-preserving integer arithmetic. The
    * pixel work itself would live in the decoder slot.
    */
  def mediaResize(spark: SparkSession, dir: String): DataFrame =
    decoded(spark, dir).toDF()
      .withColumn("scale_num", lit(64))
      .withColumn("scale_den", greatest(col("width"), col("height")))
      .select(
        col("doc_id"), col("width"), col("height"),
        when(col("scale_den") <= 64, col("width"))
          .otherwise((col("width") * col("scale_num") / col("scale_den"))
            .cast(IntegerType)).as("out_width"),
        when(col("scale_den") <= 64, col("height"))
          .otherwise((col("height") * col("scale_num") / col("scale_den"))
            .cast(IntegerType)).as("out_height"))

  /** Integer-exact box-average downsample to (ow, oh): output cell
    * (x, y) covers the input box [x·w/ow, (x+1)·w/ow) × [y·h/oh,
    * (y+1)·h/oh) (the [[ImageCodec.dhash64]] grid rule) and each channel
    * averages by integer division — deterministic everywhere, no float
    * resampling kernels.
    */
  private[graft] def boxDownsample(
      img: ImageCodec.Image, ow: Int, oh: Int): ImageCodec.Image = {
    val out = new Array[Byte](3 * ow * oh)
    var y = 0
    while (y < oh) {
      val y0 = y * img.height / oh
      val y1 = (y + 1) * img.height / oh
      var x = 0
      while (x < ow) {
        val x0 = x * img.width / ow
        val x1 = (x + 1) * img.width / ow
        var r = 0L; var g = 0L; var b = 0L
        var yy = y0
        while (yy < y1) {
          var xx = x0
          while (xx < x1) {
            val p = 3 * (yy * img.width + xx)
            r += img.rgb(p) & 0xff
            g += img.rgb(p + 1) & 0xff
            b += img.rgb(p + 2) & 0xff
            xx += 1
          }
          yy += 1
        }
        val area = (x1 - x0).toLong * (y1 - y0)
        val q = 3 * (y * ow + x)
        out(q) = (r / area).toByte
        out(q + 1) = (g / area).toByte
        out(q + 2) = (b / area).toByte
        x += 1
      }
      y += 1
    }
    ImageCodec.Image(ow, oh, out)
  }

  /** REAL thumbnailing in the decode slot — the pixel work
    * [[mediaResize]] only PLANS: decode the payload, box-average
    * downsample to the same aspect-preserving 64-box target, re-encode
    * in the INPUT's own format, and report the re-encoded payload's
    * ACTUAL byte length (both codec directions execute per row, the
    * [[AudioOps.audioResample]] discipline). Oracle re-derives every
    * field from the exact PPM/BMP byte layouts; corrupt payloads
    * quarantine as all-zero rows with format='corrupt'.
    */
  def mediaThumbnail(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaPayloads(spark, dir)
      .mapPartitions(_.map { r =>
        try {
          val fmt = ImageCodec.sniff(r.payload).get
          val img = ImageCodec.decode(r.payload)
          val mx = math.max(img.width, img.height)
          val (ow, oh) =
            if (mx <= 64) (img.width, img.height)
            else (img.width * 64 / mx, img.height * 64 / mx)
          val thumb = boxDownsample(img, ow, oh)
          val encoded = fmt match {
            case "bmp" => ImageCodec.encodeBmp(thumb)
            case "png" => ImageCodec.encodePng(thumb)
            case _     => ImageCodec.encodePpm(thumb)
          }
          (r.doc_id, img.width, img.height, ow, oh, encoded.length, fmt)
        } catch {
          case _: IllegalArgumentException | _: NoSuchElementException =>
            (r.doc_id, 0, 0, 0, 0, 0, "corrupt")
        }
      })
      .toDF("doc_id", "width", "height", "out_width", "out_height",
        "out_bytes", "format")
  }

  /** REAL image feature extraction — pixel statistics computed from the
    * DECODED image in the decode slot: mean gray level and a 4-bin
    * intensity histogram over the red channel (the fixtures are
    * grayscale by construction, so R is gray). The oracle never touches
    * pixels: it derives the SAME numbers analytically from the fixture's
    * 16×16 block structure (each block's pixel count is an exact
    * ceil-difference formula, its value a text byte), so a hash match
    * PROVES the whole encode→decode→pixel-walk path reproduces the
    * analytic content exactly — a stronger gate than re-deriving byte
    * lengths. Corrupt payloads quarantine as all-zero rows.
    */
  def imageFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaPayloads(spark, dir)
      .mapPartitions(_.map { r =>
        try {
          val img = ImageCodec.decode(r.payload)
          var sum = 0L
          val bins = new Array[Long](4)
          var i = 0
          val n = img.width * img.height
          while (i < n) {
            val v = img.rgb(3 * i) & 0xff
            sum += v
            bins(v >> 6) += 1
            i += 1
          }
          (r.doc_id, img.width, img.height, n.toLong, sum,
            bins(0), bins(1), bins(2), bins(3),
            sum.toDouble / n)
        } catch {
          case _: IllegalArgumentException | _: NoSuchElementException =>
            (r.doc_id, 0, 0, 0L, 0L, 0L, 0L, 0L, 0L, 0.0)
        }
      })
      .toDF("doc_id", "width", "height", "n_pixels", "sum_gray",
        "bin0", "bin1", "bin2", "bin3", "mean_gray")
  }

  /** Deterministic 8-ALIGNED image for the JPEG lane: constant 8×8
    * tiles (2..17 a side, so 16..136 px dims straddle the 64-box
    * thumbnail target like [[buildImage]]), tile values sampling the
    * first 128 text bytes. Tile alignment is what makes the JPEG round
    * trip ANALYTIC: every 8×8 block is constant, so the encoder's flat
    * shortcut emits exactly DC = 8·(v−128) and the decoder's DC-only
    * IDCT returns clamp(2·round((v−128)/2) + 128) at luma quant step
    * [[JpegCodec.QuantDc]] — integer arithmetic end to end, replayable
    * in SQL (the analytic-oracle discipline of [[imageFeatures]], with
    * the LOSSY quantization chain inside the proof).
    */
  private[graft] def buildJpegImage(textBytes: Array[Byte]): ImageCodec.Image = {
    val nb = textBytes.length
    val tx = 2 + (nb / 16) % 16
    val ty = 2 + (nb / 32) % 16
    val w = 8 * tx; val h = 8 * ty
    val m = math.min(math.max(nb, 1), 128)
    val rgb = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      val j = y / 8
      var x = 0
      while (x < w) {
        val i = x / 8
        val v: Byte = if (nb == 0) 0 else textBytes((j * tx + i) % m)
        val p = 3 * (y * w + x)
        rgb(p) = v; rgb(p + 1) = v; rgb(p + 2) = v
        x += 1
      }
      y += 1
    }
    ImageCodec.Image(w, h, rgb)
  }

  /** REAL JPEG feature extraction — the [[imageFeatures]] gate pushed
    * through the LOSSY codec: every document renders to the 8-aligned
    * constant-tile gray image, encodes as a real baseline JPEG
    * ([[JpegCodec.encodeJpeg]] — flat-shortcut DCT, Annex-K Huffman,
    * byte stuffing), decodes back through the full marker/DHT/entropy
    * path, and reports the SAME pixel statistics. The oracle never
    * touches bytes: it replays the tile grid AND the DC quantization
    * chain clamp(2·floor((v−127)/2)+128) analytically, so a hash match
    * PROVES the whole encode→Huffman→decode→IDCT path lands on the
    * mathematically-required output for every row. (ASCII fixture
    * assumption as in [[imageFeatures]]: the oracle indexes text by
    * CHARACTER; true for these corpora.) Corrupt payloads would
    * quarantine as all-zero rows, same contract as the other decode
    * slots.
    *
    * Scale: pure map — one partition-wise pass, both codec directions
    * per row, no shuffle at all (PlanSpec-pinned); per-row work is
    * linear in pixels like every codec op.
    */
  def jpegFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.balanced(Tables.documents(spark, dir)) // r17: 1-split scan serialized the encode/decode slot (guide §2.5)
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        try {
          val jpeg = JpegCodec.encodeJpeg(buildJpegImage(r.payload))
          val img = ImageCodec.decode(jpeg)
          var sum = 0L
          val bins = new Array[Long](4)
          var i = 0
          val n = img.width * img.height
          while (i < n) {
            val v = img.rgb(3 * i) & 0xff
            sum += v
            bins(v >> 6) += 1
            i += 1
          }
          (r.doc_id, img.width, img.height, n.toLong, sum,
            bins(0), bins(1), bins(2), bins(3),
            sum.toDouble / n)
        } catch {
          case _: IllegalArgumentException | _: NoSuchElementException =>
            (r.doc_id, 0, 0, 0L, 0L, 0L, 0L, 0L, 0L, 0.0)
        }
      })
      // entropy-coded byte LENGTH is deliberately not surfaced (not
      // SQL-derivable); the oracle-compared surface is the decoded-pixel
      // statistics, which the quantization chain fully determines
      .toDF("doc_id", "width", "height", "n_pixels", "sum_gray",
        "bin0", "bin1", "bin2", "bin3", "mean_gray")
  }

  /** STUB feature extraction: payload → fixed-width feature vector
    * (8 deterministic hash-derived doubles standing in for a CNN/CLIP
    * embedding). The Spark-side contract — binary in, array<double> out,
    * partition-wise, no shuffle — is the real shape; a deployment swaps
    * the body for the model call. Output is summarized (vector norm) so
    * the op is oracle-checkable end to end.
    */
  def featureExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // NOT balanced (r17): the per-row map is 8 integer ops — repartition
    // overhead would exceed the work it parallelizes (op benches ~90 ms)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      .as[MediaRow]
      .mapPartitions(_.map { r => // one "model init" per partition
        val n = r.payload.length
        val feats = Array.tabulate(8)(i => ((n * 31 + i * 7) % 1000) / 1000.0)
        (r.doc_id, feats, math.sqrt(feats.map(x => x * x).sum))
      })
      .toDF("doc_id", "features", "feat_norm")
      // The raw vector stays internal (array cells aren't comparator-safe);
      // the boundary surfaces the norm plus a joined rendering of the first
      // element — enough to pin the per-element values end to end.
      .select(col("doc_id"), col("feat_norm"), col("features")(0).as("feat0"))
  }

  /** REAL perceptual hash in the decoder slot: parse the encoded payload
    * ([[ImageCodec.decode]]) and dHash the actual pixels — grayscale,
    * 9×8 box-average downsample, 64 gradient bits, integer-exact cell
    * comparisons. Near-identical images (the planted near-dup documents
    * encode to them) land within a few bits. Pure function of the bytes;
    * unknown formats fall back to [[stubPhash64]].
    *
    * TOTAL by contract, like [[realDecode]]: a payload whose magic sniffs
    * but whose body is malformed (the case realDecode tags 'corrupt'), or
    * a valid image too small for dHash's 9×8 grid, falls back to the
    * byte-histogram hash instead of killing the job — the decode-slot
    * quarantine discipline applied to the hash slot feeding the same
    * pipeline.
    */
  def phash64(payload: Array[Byte]): Long =
    if (ImageCodec.sniff(payload).isDefined)
      try ImageCodec.dhash64(ImageCodec.decode(payload))
      catch {
        case _: IllegalArgumentException | _: NoSuchElementException =>
          stubPhash64(payload)
      }
    else stubPhash64(payload)

  /** Byte-histogram stand-in hash for undecodable formats: 65 coarse
    * block sums over the raw payload, one gradient bit per adjacent
    * pair. Kept as [[phash64]]'s fallback.
    */
  def stubPhash64(payload: Array[Byte]): Long = {
    val n = math.max(payload.length, 1).toLong
    val blocks = new Array[Long](65)
    var i = 0
    while (i < payload.length) {
      // index math in Long: i * 65 wraps Int once payloads reach ~33 MB
      blocks((i.toLong * 65L / n).toInt) += (payload(i) & 0xff).toLong
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

  /** Perceptual-hash near-duplicate detection over the media column — the
    * image-dedup primitive (same phash, near-identical image). Decode +
    * hash REAL pixels in the partition-wise decode slot (no shuffle), then
    * the [[graft.ops.DedupOps]] banding discipline: 4×16-bit bands,
    * candidates only from shared-band equi-join buckets (ids+bands
    * shuffle, never payloads), exact `bit_count(xor)` verify. By
    * pigeonhole, EVERY pair within Hamming ≤ 3 shares at least one intact
    * band, so the banded search is exact for the emitted radius —
    * MediaPhashSpec pins that against a brute-force all-pairs scan.
    * Rows-only in the registry (bit-level hash output has no SQL-oracle
    * twin).
    */
  def mediaPhashDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fp = Tables.ckpt(
      // NOT balanced (r17): the dHash slot decodes thumbnail-sized images —
      // cheaper than the repartition it would ride (A/B: 0.45 → 0.79 s)
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
        .as[MediaRow]
        .mapPartitions(_.map(r =>
          (r.doc_id, phash64(buildPhashPayload(r.payload)))))
        .toDF("doc_id", "phash"))
    val banded = fp.select(col("doc_id"), expr(
      """explode(array(
        |  named_struct('band_id', 0, 'band_val', phash & 65535),
        |  named_struct('band_id', 1, 'band_val', shiftright(phash, 16) & 65535),
        |  named_struct('band_id', 2, 'band_val', shiftright(phash, 32) & 65535),
        |  named_struct('band_id', 3, 'band_val', shiftright(phash, 48) & 65535)))"""
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
      .join(fp.select(col("doc_id").as("doc_a"), col("phash").as("ph_a")), "doc_a")
      .join(fp.select(col("doc_id").as("doc_b"), col("phash").as("ph_b")), "doc_b")
      .withColumn("hamming", bit_count(col("ph_a").bitwiseXOR(col("ph_b"))))
      .filter(col("hamming") <= 3)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Deterministic 8-aligned frame f of a document's video: the
    * [[buildJpegImage]] constant-tile grid with the sampled text byte
    * SHIFTED by the frame index — consecutive frames of one video are
    * near-identical (the temporal coherence real video has), and every
    * frame's decoded statistics stay an exact analytic function of
    * (text, f) for the oracle.
    */
  private[graft] def buildVideoFrame(
      textBytes: Array[Byte], f: Int): ImageCodec.Image = {
    val nb = textBytes.length
    val tx = 2 + (nb / 16) % 16
    val ty = 2 + (nb / 32) % 16
    val w = 8 * tx; val h = 8 * ty
    val m = math.min(math.max(nb, 1), 128)
    val rgb = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      val j = y / 8
      var x = 0
      while (x < w) {
        val i = x / 8
        val v: Byte = if (nb == 0) 0 else textBytes((j * tx + i + f) % m)
        val p = 3 * (y * w + x)
        rgb(p) = v; rgb(p + 1) = v; rgb(p + 2) = v
        x += 1
      }
      y += 1
    }
    ImageCodec.Image(w, h, rgb)
  }

  /** Frame-count and frame-rate for a document's video, public so the
    * oracle SQL interpolates the SAME derivations (analytic in nb).
    */
  val VideoMaxFrames = 7
  val VideoFpsBase = 10
  val VideoFpsSpan = 20

  /** documents → genuinely encoded MJPEG-in-AVI payloads: 1..7 real
    * baseline-JPEG frames ([[JpegCodec.encodeJpeg]]) wrapped in a real
    * RIFF/AVI container ([[AviCodec.encodeAvi]]) — every video op
    * exercises BOTH codec layers on every document. Encoding runs
    * partition-wise; only (id, bytes) rows exist, never a driver copy.
    */
  def videoPayloads(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.balanced(Tables.documents(spark, dir)) // r17: 1-split scan serialized the encode/decode slot (guide §2.5)
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        val nb = r.payload.length
        val nFrames = 1 + nb % VideoMaxFrames
        val fps = VideoFpsBase + nb % VideoFpsSpan
        val frames = (0 until nFrames)
          .map(f => JpegCodec.encodeJpeg(buildVideoFrame(r.payload, f)))
        val tx = 2 + (nb / 16) % 16
        val ty = 2 + (nb / 32) % 16
        MediaRow(r.doc_id,
          AviCodec.encodeAvi(8 * tx, 8 * ty, fps, frames))
      })
  }

  /** REAL video metadata in the decode slot: parse the AVI container
    * headers (avih/strh/strf — [[AviCodec.decodeAvi]] validates the full
    * chunk grammar; no frame is entropy-decoded) and report the DECLARED
    * codec/dims/fps/frame count. The oracle re-derives every field
    * analytically from the fixture rules, so a hash match proves the
    * encode→container-parse path end to end. Corrupt payloads quarantine
    * as zero rows with codec='corrupt' (the realDecode contract).
    *
    * Scale: pure map, one partition-wise pass. The PARSE side is
    * header-only (frame payloads are never entropy-decoded); the synthetic
    * fixture necessarily pays the full JPEG+AVI encode per row to build
    * the payload it parses, so encode cost dominates HERE — on a real
    * corpus where the AVI bytes already exist, the census is header-only
    * end to end (the 100 TB lever).
    */
  def videoMeta(spark: SparkSession, dir: String): DataFrame =
    videoMetaRows(Tables.balanced(Tables.documents(spark, dir)))

  /** The ONE encode→container-parse definition behind [[videoMeta]] and
    * the streaming twin [[graft.streaming.MediaMetaStream]]: accepts any
    * (doc_id, text) frame — batch OR streaming (the map is stateless, so
    * it runs unmodified under a streaming plan) — and both paths are
    * bit-identical by construction.
    */
  def videoMetaRows(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        val nb = r.payload.length
        val nFrames = 1 + nb % VideoMaxFrames
        val fps = VideoFpsBase + nb % VideoFpsSpan
        val frames = (0 until nFrames)
          .map(f => JpegCodec.encodeJpeg(buildVideoFrame(r.payload, f)))
        val tx = 2 + (nb / 16) % 16
        val ty = 2 + (nb / 32) % 16
        val avi = AviCodec.encodeAvi(8 * tx, 8 * ty, fps, frames)
        try {
          val (m, _) = AviCodec.decodeAvi(avi)
          (r.doc_id, "mjpeg", m.width, m.height, m.fps, m.nFrames.toLong)
        } catch {
          case _: IllegalArgumentException | _: NoSuchElementException =>
            (r.doc_id, "corrupt", 0, 0, 0, 0L)
        }
      })
      .toDF("doc_id", "codec", "width", "height", "fps", "n_frames")
  }

  /** REAL frame sampling — the op that replaced the r11 byte-offset
    * stand-in: every 2nd frame of each document's AVI is entropy-decoded
    * through the full JPEG path and reduced to its pixel statistics
    * (mean gray + pixel count), one row per sampled frame. The oracle
    * never touches bytes: it replays the per-frame tile grid AND the DC
    * quantization chain analytically (the jpeg_features discipline with
    * the frame index riding the byte lookup), so a hash match PROVES
    * container walk + per-frame Huffman decode + IDCT land on the
    * mathematically-required pixels for every sampled frame. Corrupt
    * payloads quarantine as a single all-zero row.
    *
    * Scale: pure map with a bounded per-row fan-out (≤ 4 sampled frames
    * per video at the fixture's 1..7 frame counts) — the explode happens
    * INSIDE the decode slot before any shuffle; downstream sees (doc,
    * frame) rows that partition freely. Decode cost is per SAMPLED
    * frame only: unsampled frame chunks are skipped undecoded.
    */
  def videoFrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    videoPayloads(spark, dir)
      .mapPartitions(_.flatMap { r =>
        try {
          val (m, frames) = AviCodec.decodeAvi(r.payload)
          (0 until m.nFrames by 2).map { f =>
            val img = ImageCodec.decode(frames(f))
            var sum = 0L
            var i = 0
            val n = img.width * img.height
            while (i < n) { sum += img.rgb(3 * i) & 0xff; i += 1 }
            (r.doc_id, m.nFrames.toLong, f.toLong, img.width, img.height,
              n.toLong, sum, sum.toDouble / n)
          }
        } catch {
          case _: IllegalArgumentException | _: NoSuchElementException =>
            Seq((r.doc_id, 0L, 0L, 0, 0, 0L, 0L, 0.0))
        }
      })
      .toDF("doc_id", "n_frames", "frame_idx", "width", "height",
        "n_pixels", "sum_gray", "mean_gray")
  }

  /** A/V-sync drift threshold: streams are `synced` when the duration gap
    * is at most 1/[[AvSyncTenthsPerSec]] s = 0.1 s — decided by EXACT
    * integer cross-multiplication (|nf·rate − af·fps|·10 ≤ fps·rate), so
    * the flag never rides float rounding.
    */
  val AvSyncTenthsPerSec = 10

  /** Deterministic PCM track for a document's A/V mux: rate/channels
    * bucket off quantized byte length (the [[graft.ops.AudioOps
    * .buildClip]] ladder), the sample-frame count targets the video
    * duration nf/fps PLUS a deterministic jitter of (nb%5 − 2) tenths of
    * a second — so the fixture plants in-sync, boundary, and
    * out-of-sync pairs — and PCM content samples the text bytes (the
    * buildClip fill), so the mux carries real waveform data.
    */
  private[graft] def buildAvAudio(
      textBytes: Array[Byte], nFrames: Int, fps: Int): AudioCodec.Audio = {
    val nb = textBytes.length
    val rate = ((nb / 64) % 3) match {
      case 0 => 8000; case 1 => 16000; case _ => 44100
    }
    val channels = 1 + (nb / 32) % 2
    val base = (rate.toLong * nFrames / fps).toInt
    val jitter = (nb % 5 - 2) * (rate / 10)
    val aFrames = math.max(base + jitter, 1)
    val m = math.min(math.max(nb, 1), 128)
    val samples = new Array[Short](aFrames * channels)
    var k = 0
    while (k < samples.length) {
      val v = if (nb == 0) 0
        else ((textBytes((k / 16) % m) & 0xff) - 128) * 200
      samples(k) = v.toShort
      k += 1
    }
    AudioCodec.Audio(rate, channels, samples)
  }

  /** The ONE mux→demux→sync-report definition behind [[avSyncCheck]] and
    * the streaming twin ([[graft.streaming.MediaMetaStream.avRows]]):
    * per document, REAL JPEG frames and a REAL PCM track are muxed into a
    * two-stream AVI ([[AviCodec.encodeAviAv]]), demuxed back
    * ([[AviCodec.decodeAviFull]]), and the report is computed from the
    * DECODED per-stream facts — durations, their gap, and the exact
    * integer `synced` decision. Stateless map: batch and streaming runs
    * are bit-identical by construction. Corrupt payloads quarantine as
    * codec='corrupt' all-zero rows (the realDecode contract).
    *
    * Scale: pure map, no shuffle; the PARSE side never entropy-decodes a
    * frame (the video_meta posture — the synthetic fixture pays the
    * encode to build what it demuxes).
    */
  def avSyncRows(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        val nb = r.payload.length
        val nFrames = 1 + nb % VideoMaxFrames
        val fps = VideoFpsBase + nb % VideoFpsSpan
        val frames = (0 until nFrames)
          .map(f => JpegCodec.encodeJpeg(buildVideoFrame(r.payload, f)))
        val tx = 2 + (nb / 16) % 16
        val ty = 2 + (nb / 32) % 16
        val audio = buildAvAudio(r.payload, nFrames, fps)
        val avi = AviCodec.encodeAviAv(8 * tx, 8 * ty, fps, frames, audio)
        try {
          val c = AviCodec.decodeAviFull(avi)
          val a = c.audio.get
          val vDur = c.meta.nFrames.toDouble / c.meta.fps
          val aDur = a.frames.toDouble / a.sampleRate
          val synced = AvSyncTenthsPerSec.toLong *
            math.abs(c.meta.nFrames.toLong * a.sampleRate -
              a.frames.toLong * c.meta.fps) <=
            c.meta.fps.toLong * a.sampleRate
          (r.doc_id, "mjpeg+pcm", c.meta.nFrames.toLong, c.meta.fps,
            a.frames.toLong, a.sampleRate, a.channels,
            vDur, aDur, vDur - aDur, synced)
        } catch {
          case _: IllegalArgumentException | _: NoSuchElementException =>
            (r.doc_id, "corrupt", 0L, 0, 0L, 0, 0, 0.0, 0.0, 0.0, false)
        }
      })
      .toDF("doc_id", "codec", "n_frames", "fps", "audio_frames",
        "sample_rate", "channels", "video_dur", "audio_dur", "drift",
        "synced")
  }

  /** A/V-sync audit over the corpus — the mux-integrity gate a video
    * pipeline runs before training on (video, audio) pairs: per document,
    * both streams' DECLARED durations from the demuxed container and the
    * drift flag. Fully oracle-checked analytically (every field is a
    * pure function of nb through the fixture rules, so a hash match
    * proves encode→mux→demux→per-stream-headers end to end, audio leg
    * included).
    */
  def avSyncCheck(spark: SparkSession, dir: String): DataFrame =
    avSyncRows(Tables.balanced(Tables.documents(spark, dir)))
}
