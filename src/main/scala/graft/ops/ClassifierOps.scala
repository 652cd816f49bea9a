package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Tables

/** Trainable quality/domain classifier — the fastText-shaped linear filter
  * every production LLM data pipeline trains over its own corpus (GPT-3's
  * WebText-vs-CommonCrawl quality model, LLaMA/CCNet's fastText language
  * and quality gates): hashed bag-of-words features, logistic regression,
  * full-batch gradient descent, scored back over every document.
  *
  * Scale shape (the part that matters at 100 TB):
  *
  *  - The feature frame (doc_id, y, xw, idx) is built ONCE — tokenize,
  *    hash each token into D buckets with `crc32 % D` (a portable,
  *    seedless hash), distinct per doc, L1-normalized per doc — and
  *    checkpoint-materialized, so T iterations re-scan a compact
  *    integer-triple frame, never the raw text.
  *  - Each iteration is exactly the two shuffles of distributed GD, both
  *    keyed on BOUNDED or data-parallel keys: (1) margins — per-doc sums of
  *    `element_at(w_map, idx)` where the D+1 weights travel as a broadcast
  *    literal map (weights are summary-cardinality, docs are
  *    data-cardinality, so weights move to data, never the reverse);
  *    (2) gradient — residuals join back to the feature frame and reduce
  *    `groupBy(idx)` to D partial sums with map-side combine.
  *  - The ONLY driver-side materialization per iteration is the gradient:
  *    D+1 doubles (an O(model) collect, the same bounded-summary discipline
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

  /** (doc_id, y, xw, idx) feature triples: one row per DISTINCT hashed
    * token per document, each carrying the document's L1 weight
    * xw = 1/|distinct features|. `array_distinct` runs inside the row
    * before the explode, so duplicate tokens never inflate the shuffle.
    */
  private def featureFrame(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        when(col("lang") === "en", 1.0d).otherwise(0.0d).as("y"),
        array_distinct(expr(
          s"transform(split(trim(text), ' '), t -> crc32(t) % $D)")).as("fs"))
      .select(
        col("doc_id"), col("y"),
        (lit(1.0) / size(col("fs"))).as("xw"),
        explode(col("fs")).as("idx"))

  /** Train and return (weights, bias, learning curve): the curve has one
    * (iter, loss, accuracy) point per iteration — mean stable logistic
    * loss and 0.5-threshold train accuracy BEFORE that iteration's update.
    * Driver state is O(model) throughout.
    */
  private[graft] def train(spark: SparkSession, dir: String)
      : (Array[Double], Double, Seq[(Int, Double, Double)]) = {
    val fx = Tables.ckpt(featureFrame(spark, dir))
    // n for the 1/n gradient scaling: one count over the doc frame (cheap,
    // and exact — fx rows are feature triples, not docs)
    val n = Tables.documents(spark, dir).count().toDouble

    var w = Array.fill(D)(0.0) // hashed-feature weights
    var b = 0.0                // bias
    val curve = Array.newBuilder[(Int, Double, Double)]

    for (it <- 1 to Iters) {
      val wMap = typedLit(w.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toMap)
      // per-doc margin m = b + Σ_{idx∈doc} w[idx]; element_at on the
      // broadcast literal map keeps the lookup inside codegen
      val doc = fx.groupBy(col("doc_id"), col("y"))
        .agg((lit(b) + sum(element_at(wMap, col("idx")) * col("xw"))).as("m"))
        .withColumn("p", lit(1.0) / (lit(1.0) + exp(-col("m"))))
        .withColumn("resid", col("p") - col("y"))
      doc.persist()
      try {
        // numerically-stable mean logistic loss: log(1+e^-|m|) + max(0, m·(1-2y))
        // (≡ -y·log p - (1-y)·log(1-p) without overflow for any margin)
        val stats = doc.agg(
          avg(log1p(exp(-abs(col("m")))) +
            greatest(lit(0.0), col("m") * (lit(1.0) - lit(2.0) * col("y")))).as("loss"),
          avg(when((col("p") >= 0.5) === (col("y") === 1.0), 1.0).otherwise(0.0)).as("acc"))
          .head()
        curve += ((it, stats.getDouble(0), stats.getDouble(1)))
        // gradient: residuals fan back over the feature triples and reduce
        // to D partial sums (map-side combine; D-bounded shuffle), plus the
        // bias term from the doc frame directly
        val grad = fx.join(doc.select(col("doc_id"), col("resid")), Seq("doc_id"))
          .groupBy(col("idx")).agg(sum(col("resid") * col("xw")).as("g"))
          .collect().map(r => (r.getLong(0).toInt, r.getDouble(1))).toMap
        val gb = doc.agg(sum(col("resid"))).head().getDouble(0)
        w = Array.tabulate(D)(i => w(i) - Lr / n * grad.getOrElse(i, 0.0))
        b = b - Lr / n * gb
      } finally doc.unpersist()
    }
    (w, b, curve.result().toSeq)
  }

  /** The pipeline product: every document scored by the trained filter —
    * a fully distributed pass (weights broadcast as a literal map, one
    * doc-key shuffle for the margins), the shape a 100 TB corpus filter
    * actually runs after training on a sample. Columns: doc_id, the
    * training label, the sigmoid score, and the 0.5-threshold decision.
    * Iterative float training has no SQL oracle (rows-only, one row per
    * document); ClassifierSpec pins both the learning curve and these
    * scores against the single-threaded recomputation.
    */
  def qualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val (w, b, _) = train(spark, dir)
    val wMap = typedLit(w.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toMap)
    featureFrame(spark, dir)
      .groupBy(col("doc_id"), col("y"))
      .agg((lit(b) + sum(element_at(wMap, col("idx")) * col("xw"))).as("m"))
      .select(
        col("doc_id"),
        col("y").cast(IntegerType).as("label"),
        (lit(1.0) / (lit(1.0) + exp(-col("m")))).as("score"),
        (col("m") >= 0.0).as("pred_en"))
  }
}
