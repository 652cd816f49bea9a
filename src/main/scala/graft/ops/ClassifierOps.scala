package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Tables

/** Trainable quality/domain classifier — the fastText-shaped linear filter
  * every production LLM data pipeline trains over its own corpus (GPT-3's
  * WebText-vs-CommonCrawl quality model, LLaMA/CCNet's fastText language
  * and quality gates): hashed bag-of-words features, logistic regression,
  * full-batch gradient descent on the deterministic 80% TRAIN bucket,
  * held-out loss/accuracy reported on the 10% test bucket per iteration,
  * scored back over every document.
  *
  * Scale shape (the part that matters at 100 TB):
  *
  *  - The feature frame (doc_id, y, xw, fs, split) is built ONCE — tokenize,
  *    hash each token into D buckets with `crc32 % D` (a portable,
  *    seedless hash), distinct per doc, L1-normalized per doc — and
  *    checkpoint-materialized, so T iterations (and the final scoring
  *    pass) re-scan a compact per-doc integer-array frame, never the
  *    raw text.
  *  - Each iteration is ONE job with ONE shuffle: margins/residuals are a
  *    pure per-row fold of the feature array against the D+1 weights
  *    traveling as a broadcast literal map (weights are
  *    summary-cardinality, docs are data-cardinality, so weights move to
  *    data, never the reverse — and the doc frame is never re-keyed);
  *    the gradient explodes the arrays (a sentinel index appended per
  *    train doc, a bare sentinel per test doc) and reduces `groupBy(idx)`
  *    to D+2 partial sums with map-side combine — gradient, bias
  *    gradient, train and holdout loss/accuracy all ride the SAME single
  *    exchange and collect.
  *  - The ONLY driver-side materialization per iteration is the gradient:
  *    D+2 doubles (an O(model) collect, the same bounded-summary discipline
  *    as [[SimilarityOps]]' codebooks). Documents are never collected.
  *
  * No RNG anywhere: weights init at zero, the hash is seedless, labels
  * derive from the data (`lang = 'en'`), so training is reproducible across
  * reruns and repartitionings. Iterative float training has no SQL oracle
  * (rows-only); ClassifierSpec recomputes the identical GD single-threaded
  * in plain Scala and pins the loss curve and final accuracy.
  */
object ClassifierOps {

  /** Hashed feature dimension. 128 buckets over a ~50-token vocabulary per
    * doc keeps collisions realistic (production uses 2^20; the mechanics
    * are dimension-independent).
    */
  private[ops] val D = 128

  /** GD iterations and step size. Features are L1-normalized per document
    * (x_j = 1/|doc features|), so every row of the design matrix has unit
    * L1 norm, the logistic Hessian's largest eigenvalue is ≤ 1/4, and
    * lr = 0.5 sits far inside the 2/L monotone-descent band — raw binary
    * presence features overshoot at this step (ClassifierSpec pins the
    * monotone curve).
    */
  private[ops] val Iters = 8
  private[ops] val Lr = 0.5

  /** (doc_id, y, xw, fs, split) — one row per DOCUMENT, features kept as
    * the in-row array of DISTINCT hashed token indices with the L1 weight
    * xw = 1/|fs|. Keeping features un-exploded is what makes every
    * margin pass shuffle-FREE (a per-row array fold against the
    * broadcast weight map); only the gradient reduction ever explodes.
    * `split` is [[PipelineOps.trainTestSplit]]'s deterministic 80/10/10
    * hash bucket: the model trains on `train` and reports held-out
    * metrics on `test` — the production shape, where a quality filter is
    * fit on a labeled sample and validated on data it never saw.
    */
  /** The tokenize→hash→weight feature projection over ANY frame with
    * (doc_id, text, lang) — stateless per-row, so the SAME projection
    * scores a batch corpus or a STREAMING source unchanged.
    */
  private[graft] def features(docs: DataFrame): DataFrame =
    docs
      .select(
        col("doc_id"),
        when(col("lang") === "en", 1.0d).otherwise(0.0d).as("y"),
        array_distinct(expr(
          s"transform(split(trim(text), ' '), t -> crc32(t) % $D)")).as("fs"),
        when(PipelineOps.hashBucket(col("doc_id")) < 80, "train")
          .when(PipelineOps.hashBucket(col("doc_id")) < 90, "val")
          .otherwise("test").as("split"))
      .withColumn("xw", lit(1.0) / size(col("fs")))

  private def featureFrame(spark: SparkSession, dir: String): DataFrame =
    features(Tables.documents(spark, dir))

  /** Per-row margin m = b + xw · Σ_{i∈fs} w[i]: a left-fold over the
    * feature array against the broadcast literal weight map — no shuffle,
    * and the fold order (array order) is deterministic, so margins are
    * bit-reproducible on any partitioning.
    */
  private def margin(wMap: org.apache.spark.sql.Column, b: Double) =
    lit(b) + col("xw") * aggregate(col("fs"), lit(0.0),
      (acc, i) => acc + element_at(wMap, i))

  /** One learning-curve point: train loss/accuracy and HELD-OUT (test
    * bucket) loss/accuracy, all measured BEFORE that iteration's update.
    */
  final case class CurvePoint(
      iter: Int, loss: Double, acc: Double,
      holdoutLoss: Double, holdoutAcc: Double)

  /** Train on the `train` bucket and return (weights, bias, learning
    * curve, the materialized feature frame). The curve carries train AND
    * held-out metrics per iteration — gradient sums see ONLY train rows;
    * test rows contribute a loss/accuracy sentinel and never a gradient
    * (val rows ride the scan but emit nothing). Driver state is O(model)
    * throughout; the returned frame lets callers score WITHOUT
    * re-tokenizing the corpus.
    */
  private[graft] def train(spark: SparkSession, dir: String)
      : (Array[Double], Double, Seq[CurvePoint], DataFrame) = {
    val fx = Tables.ckpt(featureFrame(spark, dir))
    // O(splits) collect; also warms the checkpoint
    val byCnt = fx.groupBy(col("split")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = byCnt.getOrElse("train", 0L).toDouble
    val nTest = byCnt.getOrElse("test", 0L).toDouble

    var w = Array.fill(D)(0.0) // hashed-feature weights
    var b = 0.0                // bias
    val curve = Array.newBuilder[CurvePoint]

    for (it <- 1 to Iters) {
      val wMap = typedLit(w.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toMap)
      // ONE job, ONE scan of the checkpointed frame, ONE idx-keyed
      // exchange per iteration: margins/residuals are a pure per-row
      // fold (no doc-key exchange); then every TRAIN row explodes its
      // feature array WITH a sentinel idx −1 appended and every TEST row
      // emits only the sentinel −2, so a single groupBy(idx) partial agg
      // carries the D gradient sums (resid·xw on real features — train
      // rows only by construction) and, on the sentinel rows, the bias
      // gradient Σ resid, the summed stable logistic loss
      // log(1+e^-|m|) + max(0, m·(1-2y)) (≡ -y·log p − (1−y)·log(1−p)
      // without overflow) and the correct-prediction count, keyed per
      // split. One D+2-row collect; metrics divide by n / nTest on the
      // driver.
      val rows = fx
        .withColumn("m", margin(wMap, b))
        .withColumn("p", lit(1.0) / (lit(1.0) + exp(-col("m"))))
        .withColumn("resid", col("p") - col("y"))
        .select(col("resid"), col("xw"), col("m"), col("y"), col("p"),
          explode(
            when(col("split") === "train", concat(col("fs"), array(lit(-1L))))
              .when(col("split") === "test", array(lit(-2L)))
              .otherwise(array(lit(-3L)))).as("idx"))
        .filter(col("idx") =!= -3L)
        .groupBy(col("idx")).agg(
          sum(when(col("idx") >= 0, col("resid") * col("xw"))
            .otherwise(col("resid"))).as("v1"),
          sum(when(col("idx") < 0,
            log1p(exp(-abs(col("m")))) +
              greatest(lit(0.0), col("m") * (lit(1.0) - lit(2.0) * col("y"))))
            .otherwise(0.0)).as("v2"),
          sum(when(col("idx") < 0 &&
              ((col("p") >= 0.5) === (col("y") === 1.0)), 1.0)
            .otherwise(0.0)).as("v3"))
        .collect()
      val grad = rows.filter(_.getLong(0) >= 0)
        .map(r => (r.getLong(0).toInt, r.getDouble(1))).toMap
      val st = rows.find(_.getLong(0) == -1L).get
      val ho = rows.find(_.getLong(0) == -2L)
      curve += CurvePoint(it, st.getDouble(2) / n, st.getDouble(3) / n,
        ho.map(_.getDouble(2) / nTest).getOrElse(Double.NaN),
        ho.map(_.getDouble(3) / nTest).getOrElse(Double.NaN))
      w = Array.tabulate(D)(i => w(i) - Lr / n * grad.getOrElse(i, 0.0))
      b = b - Lr / n * st.getDouble(1)
    }
    (w, b, curve.result().toSeq, fx)
  }

  /** The pipeline product: every document scored by the filter trained
    * on the `train` bucket — a fully distributed SHUFFLE-FREE pass over
    * the SAME checkpointed feature frame training used (the corpus is
    * tokenized exactly once), weights broadcast as a literal map, margin
    * folded per row — the shape a 100 TB corpus filter actually runs
    * after training on a sample. Columns: doc_id, the training label,
    * the sigmoid score, the 0.5-threshold decision, and the row's
    * train/val/test split (test-bucket rows are genuine holdout — the
    * model never saw them). Iterative float training has no SQL oracle
    * (rows-only, one row per document); ClassifierSpec pins the learning
    * curve (train AND holdout), and these scores, against the
    * single-threaded recomputation.
    */
  def qualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val (w, b, _, fx) = train(spark, dir)
    scoreFeatures(fx, w, b)
  }

  /** Score an already-projected feature frame with trained weights —
    * stateless: the model rides as a broadcast literal map, the margin
    * is a per-row array fold, no shuffle, no state. Works identically on
    * a batch frame or a streaming one (see
    * [[graft.streaming.QualityScoreStream]] — the train-offline /
    * score-online half of the classifier lifecycle).
    */
  /** Append (score, pred_en) to document rows RETAINING the input
    * columns — the mid-pipeline composition form of [[scoreFeatures]]
    * (which projects the scoring report shape and drops text).
    * Identical margin arithmetic — same hashed features, same
    * deterministic array-order fold over the same broadcast-literal
    * weight map — so scores are bit-equal to scoreFeatures on the same
    * rows (and batch-vs-stream bit-equal, the QualityScoreStream
    * contract). Stateless per-row; no shuffle.
    */
  private[graft] def withScore(
      docs: DataFrame, w: Array[Double], b: Double): DataFrame = {
    val wMap = typedLit(w.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toMap)
    docs
      .withColumn("fs", array_distinct(expr(
        s"transform(split(trim(text), ' '), t -> crc32(t) % $D)")))
      .withColumn("xw", lit(1.0) / size(col("fs")))
      .withColumn("m", margin(wMap, b))
      .withColumn("score", lit(1.0) / (lit(1.0) + exp(-col("m"))))
      .withColumn("pred_en", col("m") >= 0.0)
      .drop("fs", "xw", "m")
  }

  private[graft] def scoreFeatures(
      fx: DataFrame, w: Array[Double], b: Double): DataFrame = {
    val wMap = typedLit(w.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toMap)
    fx
      .withColumn("m", margin(wMap, b))
      .select(
        col("doc_id"),
        col("y").cast(IntegerType).as("label"),
        (lit(1.0) / (lit(1.0) + exp(-col("m")))).as("score"),
        (col("m") >= 0.0).as("pred_en"),
        col("split"))
  }
}
