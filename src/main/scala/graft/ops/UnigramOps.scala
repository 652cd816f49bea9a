package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Tables

/** Unigram-LM (SentencePiece-style, Kudo 2018 "Subword Regularization")
  * subword tokenization — the OTHER tokenizer real LLM pipelines choose
  * between, beside [[BpeOps]]'s BPE: a vocabulary of scored pieces and a
  * Viterbi segmentation that picks, per word, the best-scoring piece
  * cover. Two ops:
  *
  *  - [[unigramSegment]]: Viterbi segmentation under a FIXED, literal
  *    piece inventory with integer scores (100·len² per known piece,
  *    10 per unknown single char — strictly concave in length, so longer
  *    known pieces always win and the DP is exact integer arithmetic
  *    end to end). Fully ORACLE-checked: the DuckDB twin replays the
  *    whole per-word DP as a recursive CTE carrying a 4-deep score
  *    window (piece lengths are ≤ 4), over the same literal inventory
  *    interpolated from [[Pieces]] — no constant can silently diverge.
  *  - [[unigramTrain]]: the EM trainer (Viterbi hard-EM variant over the
  *    distinct-word frequency frame). Rows-only in the registry
  *    (iterated float training has no one-pass SQL twin); UnigramSpec
  *    replays the full EM single-threaded as ground truth — the
  *    bpe_merges discipline.
  *
  * Scale shape (the [[BpeOps]] argument, verbatim): NOTHING here iterates
  * the corpus. Both ops collapse text to the DISTINCT-WORD frequency
  * frame first — Heaps'-law-bounded, sublinear in corpus size — and all
  * per-word DP work runs on that frame. Segmentation joins the scored
  * word frame back by BROADCAST (the distinct-word frame is
  * dashboard-bounded per shard at any SF; at 100 TB the corpus-side pass
  * is one partial-aggregated (source, word) count). Each EM round
  * shuffles only (piece, count) partials — O(V · partitions) rows — and
  * collects O(V) to the driver, exactly the bpe_merges argmax shape.
  */
object UnigramOps {

  /** Fixed demo piece inventory (common English character n-grams —
    * public-knowledge frequency tables — plus enough coverage of the
    * fixture lexicon that multi-char pieces actually fire). Baked as
    * literals into BOTH the engine DP and the oracle SQL ([[piecesSql]]).
    * Max piece length 4 — the DP window size.
    */
  val Pieces: Seq[String] = Seq(
    // len 4
    "tion", "atio", "able", "alue", "park", "ment", "indo", "atch",
    // len 3
    "the", "ing", "and", "ent", "ble", "tab", "val", "row", "key",
    "ort", "ast", "erg", "lin", "dow", "arc", "can", "art", "ash",
    // len 2
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
    "ti", "es", "or", "te", "ta", "le", "al", "ar", "st", "ha",
    "as", "ow", "ey", "ue", "va", "sc", "sl", "fa", "ba", "me",
    "pa", "ke", "ro", "sp", "ag", "gg", "wi")

  /** Known-piece score: strictly concave bonus for length so a longer
    * known piece beats any split of itself (len² · 100).
    */
  def pieceScore(p: String): Int = 100 * p.length * p.length

  /** Unknown single characters are always segmentable at this score —
    * the DP is TOTAL over any input.
    */
  val UnkCharScore = 10

  val MaxPieceLen = 4

  /** Hard cap on the single-character seed vocabulary collected to the
    * driver by [[unigramTrain]] — bounds the collect by contract even on
    * a unicode-soup corpus whose raw alphabet is unbounded.
    */
  val SeedAlphabet = 256

  require(Pieces.distinct.size == Pieces.size, "duplicate piece")
  require(Pieces.forall(p => p.nonEmpty && p.length <= MaxPieceLen))

  /** The inventory as a SQL VALUES list `(piece, len, sc)` — interpolated
    * into the oracle so the constants are THE SAME constants.
    */
  def piecesSql: String =
    Pieces.map(p => s"('$p', ${p.length}, ${pieceScore(p)})").mkString(", ")

  /** Exact integer Viterbi DP over one word: returns (max total score,
    * min piece count among max-score segmentations). Both outputs are
    * tie-insensitive — different argmax segmentations with the same
    * score and count are indistinguishable at this boundary — so the
    * result is deterministic under any partitioning, and the oracle's
    * recursive-CTE replay lands on identical integers.
    */
  private[graft] def segmentDp(w: String, pieces: Map[String, Int]): (Long, Int) = {
    val n = w.length
    val score = new Array[Long](n + 1)
    val np = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var bestS = Long.MinValue
      var bestN = Int.MaxValue
      var j = 1
      while (j <= MaxPieceLen && j <= i) {
        val s = pieces.get(w.substring(i - j, i)) match {
          case Some(v) => v
          case None => if (j == 1) UnkCharScore else Int.MinValue
        }
        if (s != Int.MinValue) {
          val cand = score(i - j) + s
          if (cand > bestS) { bestS = cand; bestN = np(i - j) + 1 }
          else if (cand == bestS && np(i - j) + 1 < bestN) bestN = np(i - j) + 1
        }
        j += 1
      }
      score(i) = bestS
      np(i) = bestN
      i += 1
    }
    (score(n), np(n))
  }

  /** Per-(source, word) counts — the only corpus-sized pass either op
    * makes; partial aggregation collapses repeats map-side.
    */
  private def sourceWords(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("cnt"))

  /** (w, score, n_pieces) for every DISTINCT word in `words` under the
    * fixed inventory — one DP per distinct word, one piece-map build per
    * partition; shared by [[unigramSegment]] and [[unigramDocPpl]].
    */
  private def scoredWords(words: DataFrame): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val pieceMap = Pieces.map(p => p -> pieceScore(p)).toMap
    words.select(col("w")).distinct().as[String]
      .mapPartitions { it => // one map build per partition
        val m = pieceMap
        it.map { w => val (s, k) = segmentDp(w, m); (w, s, k) }
      }
      .toDF("w", "score", "n_pieces")
  }

  /** Viterbi segmentation of the corpus under the fixed literal
    * inventory, reported per source: word/char/piece totals, the exact
    * integer score total, and chars-per-piece (the compression
    * acceptance metric — ONE IEEE division at the boundary). The DP runs
    * once per DISTINCT word and broadcast-joins back.
    */
  def unigramSegment(spark: SparkSession, dir: String): DataFrame = {
    val words = sourceWords(spark, dir)
    val scored = scoredWords(words)
    words.join(broadcast(scored), "w")
      .groupBy(col("source"))
      .agg(
        sum(col("cnt")).as("n_words"),
        sum(col("cnt") * length(col("w"))).as("n_chars"),
        sum(col("cnt") * col("n_pieces")).as("n_pieces"),
        sum(col("cnt") * col("score")).as("score_total"),
        (sum(col("cnt") * length(col("w"))).cast(DoubleType) /
          sum(col("cnt") * col("n_pieces"))).as("chars_per_piece"))
  }

  /** Per-document unigram-LM score — the CCNet-shape LM quality filter
    * (Wenzek et al. 2020 filter documents by LM perplexity; here the
    * "LM" is the fixed integer-scored piece inventory, which is what
    * makes the op fully oracle-checkable): each document's words are
    * Viterbi-segmented under [[Pieces]], and the document's
    * `avg_piece_score` — total integer score over total piece count, one
    * IEEE division at the boundary — is the quality signal; documents at
    * or above [[MinAvgPieceScore]] are kept. In a deployment the
    * inventory and scores come from a trained LM ([[unigramTrain]]); the
    * filter shape — integer evidence, one division, constant threshold —
    * is exactly this.
    *
    * Scale: the corpus-sized pass is ONE per-(doc, word) partial-agg
    * count; the DP runs once per DISTINCT word (Heaps-bounded) and
    * broadcast-joins back. Same shape as [[unigramSegment]], keyed by
    * doc instead of source.
    */
  def unigramDocPpl(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("cnt"))
    val scored = scoredWords(words)
    words.join(broadcast(scored), "w")
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("n_pieces")).as("n_pieces"),
        sum(col("cnt") * col("score")).as("score_total"),
        (sum(col("cnt") * col("score")).cast(DoubleType) /
          sum(col("cnt") * col("n_pieces"))).as("avg_piece_score"))
      .withColumn("keep",
        (col("avg_piece_score") >= MinAvgPieceScore).cast(IntegerType))
  }

  /** LM-filter acceptance threshold for [[unigramDocPpl]] — public so the
    * oracle SQL interpolates THIS constant. Sits near the corpus median
    * avg piece score so the fixture exercises both branches.
    */
  val MinAvgPieceScore: Double = 280.0

  /** WordPiece-style GREEDY longest-match-first walk over one word
    * (BERT's tokenizer family — the third option real pipelines weigh,
    * against BPE and unigram-LM): at each position consume the longest
    * inventory piece that prefixes the remainder, else ONE unknown
    * character. Documented divergence from original WordPiece: an
    * unmatched character consumes as a counted unknown instead of
    * UNK-ing the whole word (the whole-word form would zero out every
    * word with one rare char — useless as a corpus statistic).
    * Returns (pieces, unknowns). Deterministic — longest match is
    * unique, no tie-breaks at all.
    */
  private[graft] def wordpieceWalk(w: String, pieces: Map[String, Int]): (Int, Int) = {
    var pos = 0
    var np = 0
    var nu = 0
    while (pos < w.length) {
      var j = math.min(MaxPieceLen, w.length - pos)
      while (j > 1 && !pieces.contains(w.substring(pos, pos + j))) j -= 1
      if (j == 1 && !pieces.contains(w.substring(pos, pos + 1))) nu += 1
      pos += j
      np += 1
    }
    (np, nu)
  }

  /** Greedy WordPiece segmentation of the corpus under the same fixed
    * literal inventory as [[unigramSegment]], reported per source — the
    * greedy-vs-optimal contrast is visible in the output (wordpiece
    * piece counts are ≥ the unigram DP's by construction). Same scale
    * shape: walk once per DISTINCT word, broadcast-join back. Fully
    * oracle-checked: the DuckDB twin replays the greedy walk as a
    * recursive CTE taking the longest matching piece per step.
    */
  def wordpieceSegment(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = sourceWords(spark, dir)
    val pieceMap = Pieces.map(p => p -> pieceScore(p)).toMap
    val scored = words.select(col("w")).distinct().as[String]
      .mapPartitions { it =>
        val m = pieceMap
        it.map { w => val (np, nu) = wordpieceWalk(w, m); (w, np, nu) }
      }
      .toDF("w", "n_pieces", "n_unknown")
    words.join(broadcast(scored), "w")
      .groupBy(col("source"))
      .agg(
        sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("n_pieces")).as("n_pieces"),
        sum(col("cnt") * col("n_unknown")).as("n_unknown"),
        (sum(col("cnt") * col("n_pieces")).cast(DoubleType) /
          sum(col("cnt"))).as("pieces_per_word"))
  }

  // ------------------------------------------------------------ trainer

  /** Viterbi path under float log-probs, returning the piece sequence.
    * Tie-break: a strictly greater score replaces; on exact equality the
    * FIRST candidate in j-ascending order (shortest last piece) wins —
    * fixed evaluation order, so the path is a pure function of
    * (word, model) and partitioning cannot change E-step counts.
    */
  private[graft] def viterbiPieces(
      w: String, logp: Map[String, Double]): Seq[String] = {
    val n = w.length
    val score = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var bestS = Double.NegativeInfinity
      var bestJ = 1
      var j = 1
      while (j <= MaxPieceLen && j <= i) {
        logp.get(w.substring(i - j, i)) match {
          case Some(lp) =>
            val cand = score(i - j) + lp
            if (cand > bestS) { bestS = cand; bestJ = j }
          case None => // singles are always in the model; longer misses skip
        }
        j += 1
      }
      score(i) = bestS
      back(i) = bestJ
      i += 1
    }
    val out = ArrayBuffer[String]()
    var p = n
    while (p > 0) { out += w.substring(p - back(p), p); p -= back(p) }
    out.reverse.toSeq
  }

  /** One M-step: counts → log-probs. Multi-char pieces that earned no
    * count are PRUNED; single chars are floored at pseudo-count 0.5 so
    * the model always covers the alphabet (the DP stays total).
    */
  private[graft] def mStep(counts: Map[String, Long]): Map[String, Double] = {
    val total = counts.values.sum.toDouble
    counts.flatMap { case (p, c) =>
      if (c > 0) Some(p -> math.log(c / total))
      else if (p.length == 1) Some(p -> math.log(0.5 / total))
      else None
    }
  }

  /** EM training (Viterbi hard-EM): seed = every single character plus
    * the top `seedMulti` substrings of length 2..4 by freq-weighted
    * occurrence count (deterministic tiebreak count desc, piece asc —
    * ONE bounded collect, the bpe argmax shape); then `iters` rounds of
    * E (per-distinct-word Viterbi, freq-weighted piece counts — one
    * partial-aggregated shuffle of (piece, count)) and M (driver-side
    * O(V) re-estimation + zero-count prune). Output: the final model,
    * one row per surviving piece — rank by final count, the count, and
    * the log-prob quantized to 1e-6 (`logp_q6`, a LONG — the boundary
    * never compares raw floats).
    */
  def unigramTrain(
      spark: SparkSession, dir: String,
      seedMulti: Int = 48, iters: Int = 3): DataFrame = {
    import spark.implicits._
    val wordFreq = Tables.ckpt(
      Tables.documents(spark, dir)
        .select(explode(split(lower(col("text")), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("w")).agg(count(lit(1)).as("n")))
    // seed candidates: all substrings of length 1..4, freq-weighted
    val subCounts = wordFreq.select(col("n"), explode(expr(
      s"""flatten(transform(sequence(1, $MaxPieceLen), l ->
         |  CASE WHEN length(w) >= l THEN
         |    transform(sequence(1, length(w) - l + 1), i -> substring(w, i, l))
         |  ELSE array() END))""".stripMargin)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("n")).as("cnt"))
    // The single-character seed collect is bounded BY CONTRACT, not by
    // fixture luck: a pathological unicode-soup corpus would otherwise
    // make this driver collect alphabet-sized (r10 verdict finding #3).
    // Same deterministic ordering as the multis; 256 covers any practical
    // working alphabet (characters beyond the cap fall out of the vocab,
    // exactly like sub-threshold multis).
    val singles = subCounts.filter(length(col("piece")) === 1)
      .orderBy(col("cnt").desc, col("piece"))
      .limit(SeedAlphabet)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val multis = subCounts.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece"))
      .limit(seedMulti)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    var counts: Map[String, Long] = (singles ++ multis).toMap
    var model = mStep(counts)
    val wf = wordFreq.as[(String, Long)]
    for (_ <- 1 to iters) {
      val m = model
      counts = counts.map { case (p, _) => p -> 0L } ++
        wf.mapPartitions(_.flatMap { case (w, n) =>
            viterbiPieces(w, m).map(p => (p, n))
          })
          .toDF("piece", "n")
          .groupBy(col("piece")).agg(sum(col("n")).as("cnt"))
          .collect().map(r => r.getString(0) -> r.getLong(1))
      model = mStep(counts)
    }
    val rows = model.toSeq
      .map { case (p, lp) =>
        (p, p.length, counts.getOrElse(p, 0L), math.rint(lp * 1e6).toLong)
      }
      .sortBy { case (p, _, c, _) => (-c, p) }
      .zipWithIndex
      .map { case ((p, l, c, q), i) => (i + 1, p, l, c, q) }
    rows.toDF("rank", "piece", "piece_len", "cnt", "logp_q6")
  }
}
