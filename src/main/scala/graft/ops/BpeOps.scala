package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.BpeMergeStep
import graft.model.Tables

/** Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the tokenizer
  * HALF of an LLM data pipeline: the same engine that cleans and dedups
  * the corpus learns the merge table from it.
  *
  * Scale shape, which is what makes BPE tractable at 100 TB: training
  * never iterates the corpus. One corpus-sized aggregation collapses text
  * to the DISTINCT-WORD frequency table (cardinality bounded by
  * vocabulary growth — Heaps' law, sublinear in corpus size), and every
  * merge round is then (a) one partial+final pair-count aggregation over
  * that bounded frame, (b) a 1-row driver collect of the argmax pair
  * (deterministic tiebreak: count desc, then lexicographic), (c) one
  * map-side [[BpeMergeStep]] re-segmentation (codegen'd, per-word).
  * `localCheckpoint` truncates lineage each round so round k doesn't
  * re-plan rounds 1..k-1 — same discipline as the pagerank/k-core
  * fixpoints (StatsOps).
  *
  * Differences from the paper's formulation, documented as contract:
  * no end-of-word marker (merges are intra-word either way; a `</w>`
  * sentinel would only distinguish suffix tokens), and training stops
  * early when no adjacent pair remains (every word fully merged).
  */
object BpeOps {

  /** `(n, seg)` word-frequency table: whitespace words, lowercased,
    * each segmented into single characters.
    */
  private def wordSegs(spark: SparkSession, dir: String): DataFrame =
    // balanced: the corpus explosion + word count ran on the documents
    // scan's ONE split (0.8 s single-task stage in the r17 bpe_segment
    // profile); round-robin to core count first — no-op at real scale
    Tables.balanced(Tables.documents(spark, dir))
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .select(col("n"),
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
          .as("seg"))

  private def mergeCol(seg: Column, l: String, r: String): Column =
    org.apache.spark.sql.GraftBridge.column(BpeMergeStep(
      org.apache.spark.sql.GraftBridge.expression(seg),
      org.apache.spark.sql.GraftBridge.expression(lit(l)),
      org.apache.spark.sql.GraftBridge.expression(lit(r))))

  /** The first `k` BPE merges learned from the corpus:
    * `(rank, left, right, pair_count)`, rank 1-based in merge order.
    * Fully oracle-checked since r14: the recursive-CTE training replay
    * (see bpe_segment's oracle) CARRIES the argmax pair chosen each
    * round, so the merge table is one DISTINCT over the recursion —
    * the r13 ledger's "needs driver iteration" claim was wrong, and the
    * hash match now proves the k-round argmax/tiebreak/merge sequence
    * itself, not just the final segmentation. BpeSpec's independent
    * driver-side trainer remains the ScalaTest ground truth.
    */
  def bpeMerges(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    var seg = wordSegs(spark, dir).localCheckpoint()
    val merges = ArrayBuffer[(Int, String, String, Long)]()
    var exhausted = false
    var rank = 1
    while (rank <= k && !exhausted) {
      val top = seg
        .filter(size(col("seg")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(0, size(seg)-2), i -> struct(seg[i] AS l, seg[i+1] AS r))"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, l, r, cnt))
        val prev = seg
        seg = seg.select(col("n"), mergeCol(col("seg"), l, r).as("seg"))
          .localCheckpoint()
        prev.unpersist()
        rank += 1
      }
    }
    import spark.implicits._
    val out = merges.toSeq.toDF("rank", "left", "right", "pair_count")
    seg.unpersist()
    out
  }

  /** The corpus re-tokenized under the first `k` learned merges, reported
    * as the pipeline's acceptance metric: per-source total tokens AFTER
    * merging vs single-character baseline (compression = how much of the
    * corpus the learned vocabulary explains). One corpus-sized pass;
    * merges arrive as literals baked into a k-deep [[BpeMergeStep]] chain
    * (k codegen'd array walks per word — no join, no shuffle beyond the
    * final per-source aggregate).
    *
    * Fully oracle-checked: the DuckDB twin replays the whole training as
    * a recursive CTE (argmax pair per round, greedy merge via replace()
    * on a wrapped-token string encoding) and re-aggregates — no learned
    * literal leaks into the oracle, so the check covers training AND
    * segmentation end to end.
    */
  def bpeSegment(spark: SparkSession, dir: String, k: Int = 8): DataFrame =
    mergedWords(spark, dir, k)
      .groupBy(col("source"))
      .agg(
        sum(expr("aggregate(seg, 0L, (a, t) -> a + length(t))")).as("n_chars"),
        sum(size(col("seg")).cast("long")).as("n_tokens"))
      .select(col("source"), col("n_chars"), col("n_tokens"))

  /** Per-source tokenizer FERTILITY under the learned merges — pieces
    * per word, THE standard tokenizer-quality metric for multilingual /
    * multi-source corpora (a source whose fertility stays near its
    * character count is one the vocabulary serves poorly; vocabulary
    * sizing and mixture decisions read exactly this table). Same
    * machinery as [[bpeSegment]] (ONE shared merged-word frame — the
    * queryGramFrames discipline), aggregated to word instances, pieces,
    * and chars per source with two boundary divisions. Fully
    * oracle-checked by the same recursive-CTE training replay — no
    * learned literal leaks into the oracle.
    *
    * Scale: identical to bpe_segment — the k codegen'd merge walks run
    * map-side per word instance; one partial-aggregated census.
    */
  def bpeFertility(spark: SparkSession, dir: String, k: Int = 8): DataFrame =
    mergedWords(spark, dir, k)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(size(col("seg")).cast("long")).as("n_pieces"),
        sum(expr("aggregate(seg, 0L, (a, t) -> a + length(t))")).as("n_chars"))
      .select(col("source"), col("n_words"), col("n_pieces"), col("n_chars"),
        (col("n_pieces").cast("double") / col("n_words").cast("double"))
          .as("fertility"),
        (col("n_chars").cast("double") / col("n_pieces").cast("double"))
          .as("chars_per_piece"))

  /** (source, seg) word instances re-segmented under the first k learned
    * merges — the one frame [[bpeSegment]] and [[bpeFertility]] share.
    */
  private def mergedWords(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val merges = bpeMerges(spark, dir, k).collect()
      .sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
    val base = Tables.documents(spark, dir)
      .select(col("source"), explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("source"),
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
          .as("seg"))
    merges.foldLeft(base) { case (df, (l, r)) =>
      df.withColumn("seg", mergeCol(col("seg"), l, r))
    }
  }
}
