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

  private def groundTruthCurve(docs: Seq[(String, String)]): Seq[(Double, Double)] = {
    // (features, xw, y) per doc with L1 weight xw = 1/|features|;
    // split(" ", -1) matches Spark's split semantics (trailing empties
    // kept) so double-space tokens hash identically; the strip is
    // SPACE-only (SQL trim semantics — Java String.trim would also eat
    // \n/\t and diverge on non-space edge whitespace)
    val feats = docs.map { case (text, lang) =>
      val fs = SparkSuite.sqlTrim(text).split(" ", -1).map(crcIdx).distinct
      (fs, 1.0 / fs.length, if (lang == "en") 1.0 else 0.0)
    }
    val n = feats.size.toDouble
    var w = Array.fill(D)(0.0)
    var b = 0.0
    val curve = Seq.newBuilder[(Double, Double)]
    for (_ <- 1 to Iters) {
      val scored = feats.map { case (fs, xw, y) =>
        // factored form xw·Σw(i), folded in array order — matches the
        // op's per-row `aggregate` margin bit for bit
        val m = b + xw * fs.foldLeft(0.0)((acc, i) => acc + w(i))
        val p = 1.0 / (1.0 + math.exp(-m))
        (fs, xw, y, m, p)
      }
      val loss = scored.map { case (_, _, y, m, _) =>
        math.log1p(math.exp(-math.abs(m))) + math.max(0.0, m * (1.0 - 2.0 * y))
      }.sum / n
      val acc = scored.count { case (_, _, y, _, p) => (p >= 0.5) == (y == 1.0) } / n
      curve += ((loss, acc))
      val grad = Array.fill(D)(0.0)
      var gb = 0.0
      scored.foreach { case (fs, xw, y, _, p) =>
        val r = p - y
        fs.foreach(i => grad(i) += r * xw)
        gb += r
      }
      w = Array.tabulate(D)(i => w(i) - Lr / n * grad(i))
      b = b - Lr / n * gb
    }
    curve.result()
  }

  test("distributed GD reproduces the single-threaded learning curve") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text", "lang").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val expected = groundTruthCurve(docs)

    val (_, _, got, _) = ClassifierOps.train(spark, sf)

    val n = docs.size.toDouble
    assert(got.length == Iters)
    got.zip(expected).foreach { case ((it, loss, acc), (eLoss, eAcc)) =>
      assert(math.abs(loss - eLoss) < 1e-9, s"iter $it loss: $loss vs $eLoss")
      // weights differ ~1e-16 between the distributed and sequential
      // gradient sums; a margin within that of exactly 0 could flip one
      // doc's 0.5-threshold decision — allow a single boundary flip
      assert(math.abs(acc - eAcc) <= 1.5 / n, s"iter $it accuracy: $acc vs $eAcc")
    }
    // full-batch GD on convex loss with an in-range step: monotone descent
    got.map(_._2).sliding(2).foreach { case Seq(a, b) =>
      assert(b < a, s"loss did not decrease: $a -> $b")
    }
  }

  test("scores frame is one decision per document and matches the trained model") {
    val scored = ClassifierOps.qualityClassifier(spark, sf).collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(scored.length == nDocs)
    // every score is a valid probability; the decision column is exactly
    // the 0.5 threshold of it
    scored.foreach { r =>
      val score = r.getDouble(2)
      assert(score > 0.0 && score < 1.0)
      assert(r.getBoolean(3) == (score >= 0.5))
    }
  }
}
