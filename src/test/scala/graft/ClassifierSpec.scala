package graft

import java.util.zip.CRC32

import graft.ops.ClassifierOps

/** Ground truth for the distributed logistic-regression trainer: the
  * identical GD (same crc32 % D hashing, same binary-presence features,
  * same stable loss form, same lr and iteration count) recomputed
  * single-threaded in plain Scala over the collected sf0.001 corpus.
  * Float tolerance covers summation-order differences only — the model is
  * otherwise deterministic (zero init, seedless hash, no RNG).
  */
class ClassifierSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private val D = 128
  private val Iters = 8
  private val Lr = 0.5

  private def crcIdx(tok: String): Int = {
    val c = new CRC32()
    c.update(tok.getBytes("UTF-8"))
    (c.getValue % D).toInt
  }

  /** trainTestSplit's deterministic bucket, replayed: the multiplicative
    * hash pmod(pmod(id, p)·m, p) % 100 with p = 1e9+7, m = 2654435761.
    */
  private def bucket(docId: Long): Long =
    ((docId % 1000000007L) * 2654435761L) % 1000000007L % 100L

  /** Per-iteration ground truth: (trainLoss, trainAcc, testLoss, testAcc).
    * Gradient sums see ONLY train-bucket docs; test docs contribute the
    * held-out metrics and never a gradient; val docs contribute nothing.
    */
  private def groundTruthCurve(
      docs: Seq[(Long, String, String)]): Seq[(Double, Double, Double, Double)] = {
    // (features, xw, y, split) per doc with L1 weight xw = 1/|features|;
    // split(" ", -1) matches Spark's split semantics (trailing empties
    // kept) so double-space tokens hash identically; the strip is
    // SPACE-only (SQL trim semantics — Java String.trim would also eat
    // \n/\t and diverge on non-space edge whitespace)
    val feats = docs.map { case (id, text, lang) =>
      val fs = SparkSuite.sqlTrim(text).split(" ", -1).map(crcIdx).distinct
      val split = bucket(id) match {
        case b if b < 80 => "train"
        case b if b < 90 => "val"
        case _           => "test"
      }
      (fs, 1.0 / fs.length, if (lang == "en") 1.0 else 0.0, split)
    }
    val n = feats.count(_._4 == "train").toDouble
    val nTest = feats.count(_._4 == "test").toDouble
    var w = Array.fill(D)(0.0)
    var b = 0.0
    val curve = Seq.newBuilder[(Double, Double, Double, Double)]
    for (_ <- 1 to Iters) {
      val scored = feats.map { case (fs, xw, y, split) =>
        // factored form xw·Σw(i), folded in array order — matches the
        // op's per-row `aggregate` margin bit for bit
        val m = b + xw * fs.foldLeft(0.0)((acc, i) => acc + w(i))
        val p = 1.0 / (1.0 + math.exp(-m))
        (fs, xw, y, m, p, split)
      }
      def loss(s: String, d: Double) = scored.collect { case (_, _, y, m, _, `s`) =>
        math.log1p(math.exp(-math.abs(m))) + math.max(0.0, m * (1.0 - 2.0 * y))
      }.sum / d
      def acc(s: String, d: Double) = scored.count {
        case (_, _, y, _, p, sp) => sp == s && (p >= 0.5) == (y == 1.0)
      } / d
      curve += ((loss("train", n), acc("train", n), loss("test", nTest), acc("test", nTest)))
      val grad = Array.fill(D)(0.0)
      var gb = 0.0
      scored.foreach { case (fs, xw, y, _, p, split) =>
        if (split == "train") {
          val r = p - y
          fs.foreach(i => grad(i) += r * xw)
          gb += r
        }
      }
      w = Array.tabulate(D)(i => w(i) - Lr / n * grad(i))
      b = b - Lr / n * gb
    }
    curve.result()
  }

  test("distributed GD reproduces the single-threaded train + holdout curve") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val expected = groundTruthCurve(docs)

    val (_, _, got, _) = ClassifierOps.train(spark, sf)

    val splits = docs.map(d => bucket(d._1)).groupBy {
      case b if b < 80 => "train"
      case b if b < 90 => "val"
      case _           => "test"
    }.map { case (k, v) => k -> v.size }
    val n = splits("train").toDouble
    val nTest = splits("test").toDouble
    assert(n > 0 && nTest > 0, "a split bucket is empty — spec vacuous")
    assert(got.length == Iters)
    got.zip(expected).foreach {
      case (p, (eLoss, eAcc, eHoLoss, eHoAcc)) =>
        assert(math.abs(p.loss - eLoss) < 1e-9, s"iter ${p.iter} loss: ${p.loss} vs $eLoss")
        assert(math.abs(p.holdoutLoss - eHoLoss) < 1e-9,
          s"iter ${p.iter} holdout loss: ${p.holdoutLoss} vs $eHoLoss")
        // weights differ ~1e-16 between the distributed and sequential
        // gradient sums; a margin within that of exactly 0 could flip one
        // doc's 0.5-threshold decision — allow a single boundary flip
        assert(math.abs(p.acc - eAcc) <= 1.5 / n, s"iter ${p.iter} accuracy: ${p.acc} vs $eAcc")
        assert(math.abs(p.holdoutAcc - eHoAcc) <= 1.5 / nTest,
          s"iter ${p.iter} holdout accuracy: ${p.holdoutAcc} vs $eHoAcc")
    }
    // full-batch GD on convex loss with an in-range step: monotone descent
    // on the TRAIN loss (holdout loss is not guaranteed monotone)
    got.map(_.loss).sliding(2).foreach { case Seq(a, b) =>
      assert(b < a, s"loss did not decrease: $a -> $b")
    }
  }

  test("scores frame is one decision per document, split-tagged, matching the model") {
    val scored = ClassifierOps.qualityClassifier(spark, sf).collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(scored.length == nDocs)
    // every score is a valid probability; the decision column is exactly
    // the 0.5 threshold of it; the split column is the deterministic
    // 80/10/10 bucket of doc_id (genuine holdout rows are identifiable)
    scored.foreach { r =>
      val score = r.getDouble(2)
      assert(score > 0.0 && score < 1.0)
      assert(r.getBoolean(3) == (score >= 0.5))
      val expected = bucket(r.getLong(0)) match {
        case b if b < 80 => "train"
        case b if b < 90 => "val"
        case _           => "test"
      }
      assert(r.getString(4) == expected, s"doc ${r.getLong(0)}: split mismatch")
    }
    assert(scored.map(_.getString(4)).toSet == Set("train", "val", "test"))
  }
}
