package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Tables

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, decoded partition-wise (BASELINE.json north star).
  *
  * The decode step is a clearly-marked deterministic STUB (this container
  * has no image/audio codecs); everything around it — the binary column,
  * the typed Dataset boundary, `mapPartitions` batching, the metadata
  * schema, downstream relational ops — is the real production shape. A
  * deployment swaps [[MultimodalOps.stubDecode]] for a JNI/codec call
  * without touching the plan: decode stays embarrassingly parallel
  * (per-partition, no shuffle), and only the small typed metadata rows
  * flow into the aggregation shuffle.
  */
object MultimodalOps {

  /** Opaque media payload (doc text bytes stand in for image bytes). */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Typed metadata produced by the decoder. */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Int, width: Int, height: Int, format: String)

  /** STUB decoder — deterministic fake of an image header parse.
    * Real implementation would be e.g. `ImageIO.read`/ffmpeg over the
    * payload bytes; the derived fields are a pure function of payload
    * length so the pipeline is oracle-checkable end to end.
    */
  def stubDecode(r: MediaRow): MediaMeta = {
    val n = r.payload.length
    MediaMeta(
      doc_id = r.doc_id,
      n_bytes = n,
      width = 64 + n % 512,
      height = 64 + (n / 2) % 512,
      format = (n % 3) match {
        case 0 => "png"
        case 1 => "jpeg"
        case _ => "webp"
      })
  }

  /** documents → binary payload column → partition-wise decode. */
  def decoded(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      .as[MediaRow]
      .mapPartitions(_.map(stubDecode)) // batch boundary: one decoder init per partition
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

  /** Resize planning: map decoded dimensions to a target box (max side
    * 256, aspect-preserving integer arithmetic) — the metadata half of an
    * image-resize stage; the pixel work would live in the decoder slot.
    */
  def mediaResize(spark: SparkSession, dir: String): DataFrame =
    decoded(spark, dir).toDF()
      .withColumn("scale_num", lit(256))
      .withColumn("scale_den", greatest(col("width"), col("height")))
      .select(
        col("doc_id"), col("width"), col("height"),
        when(col("scale_den") <= 256, col("width"))
          .otherwise((col("width") * col("scale_num") / col("scale_den"))
            .cast(IntegerType)).as("out_width"),
        when(col("scale_den") <= 256, col("height"))
          .otherwise((col("height") * col("scale_num") / col("scale_den"))
            .cast(IntegerType)).as("out_height"))

  /** STUB feature extraction: payload → fixed-width feature vector
    * (8 deterministic hash-derived doubles standing in for a CNN/CLIP
    * embedding). The Spark-side contract — binary in, array<double> out,
    * partition-wise, no shuffle — is the real shape; a deployment swaps
    * the body for the model call. Output is summarized (vector norm) so
    * the op is oracle-checkable end to end.
    */
  def featureExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
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

  /** dHash-style 64-bit perceptual hash in the decoder slot: 65 coarse
    * block sums over the payload, one gradient bit per adjacent pair —
    * the deterministic stand-in for resize-to-9x8-grayscale-and-compare.
    * Pure function of the bytes, so near-identical payloads (the planted
    * near-dup documents) land within a few bits. A deployment swaps this
    * body for the real image dHash after codec decode; everything
    * downstream is payload-agnostic.
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
    * image-dedup primitive (same phash, near-identical image). Hash in the
    * partition-wise decode (no shuffle), then the [[graft.ops.DedupOps]]
    * banding discipline: 4×16-bit bands, candidates only from shared-band
    * equi-join buckets (ids+bands shuffle, never payloads), exact
    * `bit_count(xor)` verify. By pigeonhole, EVERY pair within Hamming ≤ 3
    * shares at least one intact band, so the banded search is exact for
    * the emitted radius — MediaPhashSpec pins that against a brute-force
    * all-pairs scan. Rows-only in the registry (bit-level hash output has
    * no SQL-oracle twin).
    */
  def mediaPhashDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fp = Tables.ckpt(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
        .as[MediaRow]
        .mapPartitions(_.map(r => (r.doc_id, stubPhash64(r.payload))))
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

  /** Frame sampling for video-like payloads: every 10th frame index,
    * exploded to one row per sampled frame with its byte offset. The
    * explode multiplies rows BEFORE any shuffle — downstream ops see
    * (doc, frame) rows that partition freely.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    decoded(spark, dir).toDF()
      .withColumn("n_frames", greatest(floor(col("n_bytes") / 100), lit(1L)))
      .select(
        col("doc_id"),
        col("n_frames"),
        explode(expr("sequence(0, n_frames - 1, 10)")).as("frame_idx"))
      .withColumn("byte_offset", col("frame_idx") * 100)
}
