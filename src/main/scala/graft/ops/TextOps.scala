package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Tables

/** Text-analysis operators over `documents` — the language-ID / quality /
  * token-count / fingerprint layer a large-scale training-data pipeline
  * needs (BASELINE.json north star; beyond the reference's own surface).
  *
  * Everything is built-in expressions (split / higher-order array functions
  * / regexp / hash) — no UDFs, so the whole layer stays inside whole-stage
  * codegen and is embarrassingly parallel: no shuffle except the final
  * aggregations, which are partial+final on low-cardinality keys.
  */
object TextOps {

  /** Shared PII patterns (piiRedact + explodeEmails must match the SAME
    * email grammar — and their oracles). Passed as `lit(...)` columns, not
    * through `expr(...)` SQL literals, so the backslash escape survives
    * the one interpretation layer instead of being eaten by the SQL
    * parser (which would turn `\.` into any-char `.`).
    */
  private val EmailRe = "[a-z0-9._-]+@[a-z0-9.-]+\\.[a-z]+"
  private val DigitRe = "[0-9]{6,}"

  /** Per-language corpus stats: doc count, exact char sums, token totals. */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_tokens", size(split(trim(col("text")), " ")))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        (sum(col("n_chars")).cast(DoubleType) / count(lit(1))).as("avg_chars"),
        sum(col("n_tokens").cast(LongType)).as("sum_tokens"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))

  /** Per-document token counting: whitespace tokens plus a BPE-ish
    * pre-tokenizer count (alpha runs / digits / punctuation as separate
    * tokens — the GPT-2-style pre-split shape).
    */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(split(trim(col("text")), " ")).as("ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z]+', 0)")).as("alpha_tokens"),
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]', 0)"))
          .as("bpe_ish_tokens"))

  /** Language ID via a stopword n-gram heuristic. Deliberately a pure
    * deterministic expression (scores = marker-token hits per language,
    * argmax with fixed tie order) so it is oracle-checkable and cheap at
    * 100 TB — real pipelines would swap in fastText behind the same
    * column contract.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val padded = concat(lit(" "), lower(col("text")), lit(" "))
    def hits(words: Seq[String]) =
      words.map(w => when(padded.contains(s" $w "), 1).otherwise(0))
        .reduce(_ + _)
    val en = hits(Seq("the", "and", "of", "a"))
    val es = hits(Seq("el", "la", "los", "de"))
    val de = hits(Seq("der", "und", "die", "das"))
    val fr = hits(Seq("le", "les", "et", "des"))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        col("lang").as("labeled_lang"),
        when(en >= es && en >= de && en >= fr && en > 0, "en")
          .when(es >= de && es >= fr && es > 0, "es")
          .when(de >= fr && de > 0, "de")
          .when(fr > 0, "fr")
          .otherwise("unknown").as("pred_lang"))
  }

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean token
    * length — the classic cheap heuristics used to filter web corpora.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val stop = Seq("the", "and", "a", "of", "to", "data", "scan")
    val inList = stop.map(s => s"t = '$s'").mkString(" OR ")
    Tables.documents(spark, dir)
      .withColumn("tokens", split(trim(col("text")), " "))
      .withColumn("n_tokens", size(col("tokens")))
      .select(
        col("doc_id"),
        col("n_chars"),
        col("n_tokens"),
        (length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast(DoubleType)
          / col("n_chars")).as("punct_ratio"),
        (size(expr(s"filter(tokens, t -> $inList)")).cast(DoubleType)
          / col("n_tokens")).as("stopword_ratio"),
        (length(regexp_replace(col("text"), " ", "")).cast(DoubleType)
          / col("n_tokens")).as("avg_token_len"))
  }

  /** Margin gate for [[preferencePairs]] — a pair is emitted only when
    * chosen and rejected scores differ by at least this much (a
    * near-tie pair teaches a preference model nothing). Public so the
    * oracle SQL interpolates THIS value.
    */
  val PrefMinMargin = 50L

  /** The ONE exact-integer quality score shared by [[preferencePairs]],
    * [[sourceWinrate]], and the streaming twin: [[qualityScore]]'s
    * heuristics collapsed to 200·stopword_hits + n_chars − 4·punct_chars
    * over any (streaming or batch) frame carrying (text, n_chars) — the
    * shared projection is what makes the streaming twin bit-identical to
    * the batch op by construction. The score is bounded by document
    * length, so score CARDINALITY is value-range-bounded (the
    * decile_drift discipline: summaries keyed by score never grow with
    * row count).
    */
  private[graft] def withScore(docs: DataFrame): DataFrame = {
    val stop = Seq("the", "and", "a", "of", "to", "data", "scan")
    val inList = stop.map(s => s"t = '$s'").mkString(" OR ")
    docs
      .withColumn("toks", split(trim(col("text")), " "))
      .withColumn("s",
        lit(200L) * size(expr(s"filter(toks, t -> $inList)"))
          + col("n_chars")
          - lit(4L) * length(regexp_replace(col("text"), "[a-z0-9 ]", "")))
  }

  private def scoredDocs(spark: SparkSession, dir: String): DataFrame =
    withScore(Tables.documents(spark, dir))

  /** The (chosen, rejected) aggregation + gates over a scored frame —
    * shared by [[preferencePairs]] and the streaming twin
    * [[graft.streaming.PreferencePairsStream]] (the aggregation is pure
    * min_by/max_by state, so it runs unchanged as an update-mode
    * streaming agg whose state is bounded by |lang|·|source|).
    */
  private[graft] def pairsFromScored(scored: DataFrame): DataFrame =
    scored
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_candidates"),
        min_by(col("doc_id"),
          struct((-col("s")).as("ns"), col("doc_id"))).as("chosen_id"),
        max(col("s")).as("chosen_score"),
        min_by(col("doc_id"),
          struct(col("s").as("s"), col("doc_id"))).as("rejected_id"),
        min(col("s")).as("rejected_score"))
      .where(col("n_candidates") >= 2 &&
        (col("chosen_score") - col("rejected_score")) >= PrefMinMargin)
      .select(
        col("lang"), col("source"), col("chosen_id"), col("rejected_id"),
        col("chosen_score"), col("rejected_score"),
        (col("chosen_score") - col("rejected_score")).as("margin"),
        col("n_candidates"))

  /** Preference-pair mining — the DPO/RLHF data-prep step that turns a
    * scored candidate pool into (chosen, rejected) training pairs: within
    * each (lang, source) group (the prompt-cluster analog on this
    * corpus), the best-scoring document becomes `chosen` and the worst
    * becomes `rejected`, kept only when the score margin clears
    * [[PrefMinMargin]] — the standard best-of-n vs worst-of-n pair
    * construction. The [[withScore]] integer score makes argmax/argmin
    * and the margin gate engine-exact — no float ordering anywhere; ties
    * break to the lowest doc_id via a single min_by struct key on both
    * sides.
    *
    * Scale: one scan with the score computed map-side, one
    * group-cardinality-bounded aggregation — candidate texts never
    * shuffle, only (group, score, id) triples feed the agg, and the
    * output is bounded by |lang|·|source|.
    */
  def preferencePairs(spark: SparkSession, dir: String): DataFrame =
    pairsFromScored(scoredDocs(spark, dir))

  /** Pairwise win-rate matrix between sources — the "model A vs model B"
    * table every evaluation stack publishes, here over document quality:
    * for every source pair (a, b) within a language,
    * win_rate = P(random a-doc outscores a random b-doc) with ties ½ —
    * the Mann-Whitney probability of superiority U/(n_a·n_b), kept exact
    * by carrying u2 = 2·U (2·wins + ties) in BIGINT with ONE boundary
    * division. The identity u2_ab + u2_ba = 2·n_a·n_b is spec-pinned.
    *
    * The scale move: NEVER the quadratic doc-pair join — docs collapse to
    * a per-(lang, score, source) count summary whose cardinality is
    * VALUE-RANGE-bounded (scores are bounded integers), an exclusive
    * running count per (lang, source) over the shared score ladder gives
    * every source's "how many below v", and
    * u2_ab = Σ_v cnt_a(v)·(2·below_b(v) + at_b(v)) needs only the
    * summary-grid equi-join — O(values·sources²) terms per language, row
    * count never enters. The DuckDB oracle replays the textbook
    * quadratic pair scan instead (clarity over speed), so the hash match
    * also PROVES the rank-summary algebra equals the all-pairs
    * definition.
    */
  def sourceWinrate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the summary frame is consumed FOUR ways (ladder, totals, grid, a-side)
    // — checkpoint it so the corpus is scanned exactly once
    val cnts = Tables.ckpt(scoredDocs(spark, dir)
      .groupBy(col("lang"), col("s"), col("source"))
      .agg(count(lit(1)).as("cnt")))
    val ladder = cnts.select(col("lang"), col("s")).distinct()
    val srcs = cnts.groupBy(col("lang"), col("source"))
      .agg(sum(col("cnt")).as("n_total"))
    // the full (lang, score, source) grid: zero-filled so the running
    // count is defined at EVERY ladder rung for every source
    val grid = ladder.join(srcs, Seq("lang"))
      .join(cnts, Seq("lang", "s", "source"), "left")
      .na.fill(0L, Seq("cnt"))
      .withColumn("below",
        sum(col("cnt")).over(Window.partitionBy(col("lang"), col("source"))
          .orderBy(col("s")).rowsBetween(Window.unboundedPreceding, -1)))
      .na.fill(0L, Seq("below"))
    val a = cnts.select(col("lang"), col("s"),
      col("source").as("source_a"), col("cnt").as("cnt_a"))
    val b = grid.select(col("lang"), col("s"),
      col("source").as("source_b"), col("cnt").as("cnt_b"),
      col("below").as("below_b"), col("n_total").as("n_b"))
    a.join(b, Seq("lang", "s"))
      .where(col("source_a") < col("source_b"))
      .groupBy(col("lang"), col("source_a"), col("source_b"))
      .agg(
        sum(col("cnt_a") * (lit(2L) * col("below_b") + col("cnt_b")))
          .as("u2"),
        sum(col("cnt_a")).as("n_a"),
        min(col("n_b")).as("n_b"))
      .select(
        col("lang"), col("source_a"), col("source_b"),
        col("n_a"), col("n_b"), col("u2"),
        (col("u2").cast(DoubleType)
          / (lit(2L) * col("n_a") * col("n_b")).cast(DoubleType))
          .as("win_rate"))
  }

  /** Text normalization — the canonical cleaning pass before dedup /
    * tokenization: lowercase, strip non-alphanumerics to spaces, collapse
    * whitespace runs, trim. Pure codegen'd regexp expressions, no UDF.
    */
  def textNormalize(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
          " +", " ")).as("norm_text"))
      .withColumn("norm_chars", length(col("norm_text")))

  /** PII-style redaction: mask email-shaped and long-digit-run tokens —
    * the scrub pass every training corpus runs. Redaction counts surface
    * per doc so downstream filters can drop PII-heavy documents.
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        regexp_replace(regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          DigitRe, "<NUM>").as("redacted"),
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("text"), lit(DigitRe), lit(0))).as("n_long_nums"))

  /** Length histogram: fixed-width binning of document length — the
    * corpus-profiling pass (manual bin arithmetic, no engine-specific
    * width_bucket, so any SQL oracle agrees).
    */
  def lengthHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bin", (col("n_chars") / 100).cast(IntegerType) * 100)
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))

  /** Document fingerprinting: cryptographic (md5/sha256) content hashes —
    * the join key for exact dedup across corpus shards.
    */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        md5(col("text").cast(BinaryType)).as("md5_fp"),
        sha2(col("text").cast(BinaryType), 256).as("sha256_fp"))

  /** Exact dedup over documents by content hash: hash-groupBy keeping the
    * lowest doc_id (deterministic); duplicates collapse map-side in the
    * partial aggregate, so at 100 TB the shuffle carries one row per
    * DISTINCT document, not per document.
    */
  def dedupDocExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text").cast(BinaryType)).as("fp"))
      .agg(
        min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("n_copies"))

  /** Outer explode: one row per extracted email, KEEPING documents with no
    * match as a NULL row (`explode_outer`) — the generator variant plain
    * explode silently drops, which matters whenever downstream counts
    * "documents" rather than "matches".
    */
  def explodeEmails(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        explode_outer(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
          .as("email"))

  /** Ordered string aggregation (LISTAGG / string_agg): per language, the
    * three smallest doc ids comma-joined. A rank pass bounds the collected
    * rows to ≤3 per group BEFORE the aggregate — collecting every doc_id
    * into one buffer and slicing after would hold an unbounded per-group
    * array in a single task at corpus scale. The window and the groupBy
    * share the `lang` partitioning, so it is still ONE shuffle; sorting
    * the ≤3-element list makes the join order deterministic.
    */
  def stringAgg(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("rk", row_number().over(w))
      .groupBy(col("lang"))
      .agg(
        array_join(expr(
          "transform(sort_array(collect_list(CASE WHEN rk <= 3 THEN doc_id END)), x -> cast(x as string))"),
          ",").as("first_docs"),
        count(lit(1)).as("n_docs"))
  }
  /** Blocked fuzzy self-join — approximate-string-matching's scalable
    * shape: candidate pairs come from an EQUI-join on a blocking key (here
    * the name's noun; production uses q-gram/LSH blocks, same plan), and
    * the edit-distance predicate evaluates only within blocks — never a
    * cross join of the name universe. Distinct-first: at any scale the
    * name dictionary is orders of magnitude smaller than its usage rows.
    * `levenshtein` is unit-cost in both engines, so the oracle is exact.
    */
  def fuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    // split_part, not split(...).getItem(1): ANSI mode ABORTS on the
    // array index for a one-token name; split_part returns '' and matches
    // the oracle's split_part semantics exactly
    val n = Tables.part(spark, dir).select(col("p_name")).distinct()
      .withColumn("block", split_part(col("p_name"), lit(" "), lit(2)))
    n.as("a").join(n.as("b"),
        col("a.block") === col("b.block") && col("a.p_name") < col("b.p_name"))
      // threshold-bounded levenshtein: early-exits past the cutoff
      // (returns -1) and is computed ONCE — the unbounded two-site form
      // pays the full O(|a|·|b|) table twice per candidate pair
      .withColumn("dist", levenshtein(col("a.p_name"), col("b.p_name"), 3))
      .filter(col("dist") >= 0)
      .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
        col("dist"))
  }

  /** Heaps-law vocabulary growth: distinct-token vocabulary size vs
    * cumulative token count at ten equal-population document checkpoints
    * (doc_id order) — the saturation curve that decides whether more
    * corpus still buys new vocabulary. The trick that makes it ONE pass
    * instead of a distinct-count per checkpoint: a token enters the
    * vocabulary exactly at its MINIMUM doc_id, so the vocabulary size at
    * any prefix is the running sum of per-doc new-token counts — two
    * integer cumsums over the doc-cardinality frame, checkpoint rows
    * selected by pure integer rank arithmetic ((rn·10) div n changing
    * value), never a float decile.
    *
    * The cumsums are SLICE-PARTITIONED (the doc frame is
    * data-cardinality — a no-partition cumulative window would sort and
    * scan every document in ONE task): literal equi-depth doc_id
    * boundaries from one `approx_percentile` pass split the frame into
    * doc_id ranges; per-slice (count, Σtoks, Σnew) totals — an O(slices)
    * collect — become literal prefix-carry maps, and each slice's window
    * runs partition-parallel with its carry added back. Identical rows
    * to the single-window form, proven by the unchanged oracle.
    */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nSlices = 32
    val docs = Tables.documents(spark, dir)
    val newAt = docs
      .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("tok"))
      .groupBy(col("tok")).agg(min(col("doc_id")).as("fd"))
      .groupBy(col("fd")).agg(count(lit(1)).as("new_toks"))
    val base = docs.select(col("doc_id"),
        size(split(trim(col("text")), " ")).cast(LongType).as("toks"))
      .join(newAt.withColumnRenamed("fd", "doc_id"), Seq("doc_id"), "left")
      .withColumn("new_toks", coalesce(col("new_toks"), lit(0L)))
    // slice = count of ascending literal boundaries at or below doc_id —
    // monotone in doc_id order; boundary quality only affects balance
    val pcts = (1 until nSlices).map(i => i.toDouble / nSlices).mkString(", ")
    val bRow = docs
      .agg(expr(
        s"approx_percentile(cast(doc_id as double), array($pcts), 1000)")).head()
    val bounds: Seq[Double] =
      if (bRow.isNullAt(0)) Seq.empty else bRow.getSeq[Double](0).distinct.sorted
    val sliceExpr =
      if (bounds.isEmpty) lit(0)
      else expr(
        s"size(filter(array(${bounds.mkString(", ")}), b -> cast(doc_id as double) >= b))")
    val withSlice = base.withColumn("slice", sliceExpr)
    val tots = withSlice.groupBy(col("slice"))
      .agg(count(lit(1)).as("cnt"), sum(col("toks")).as("st"),
        sum(col("new_toks")).as("sn"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val n = tots.map(_._2).sum
    def carry(f: ((Int, Long, Long, Long)) => Long): Map[Int, Long] =
      tots.map(_._1).zip(tots.map(f).scanLeft(0L)(_ + _)).toMap
    val offRn = carry(_._2)
    val offToks = carry(_._3)
    val offNew = carry(_._4)
    val w = Window.partitionBy(col("slice")).orderBy(col("doc_id"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withSlice
      .withColumn("rn",
        element_at(typedLit(offRn), col("slice")) + row_number().over(w))
      .withColumn("total_tokens",
        element_at(typedLit(offToks), col("slice")) + sum(col("toks")).over(wCum))
      .withColumn("vocab_size",
        element_at(typedLit(offNew), col("slice")) + sum(col("new_toks")).over(wCum))
      .filter(expr(s"(rn * 10) div ${n}L > ((rn - 1) * 10) div ${n}L"))
      .select(
        expr(s"(rn * 10) div ${n}L").cast(IntegerType).as("checkpoint"),
        col("rn").cast(LongType).as("n_docs"),
        col("total_tokens"), col("vocab_size"))
  }

  /** Pairwise source-distribution divergence as total-variation distance —
    * 0.5·Σ|p − q| over the token distributions of every source pair, the
    * corpus-mixing drift metric. TV replaces JS/KL BY DESIGN (they need
    * ln; the no-log oracle discipline), and the float sum Σ|ca/na − cb/nb|
    * is restated over the common denominator as EXACT integers:
    * Σ_both|ca·nb − cb·na| + nb·(na − Σ_both ca) + na·(nb − Σ_both cb)
    * — the one-sided tails fall out of Σ_all ca = na, so only the
    * token-partitioned INNER join ever materializes. One division per
    * pair at the boundary; products promote to DECIMAL(38,0) (count ×
    * corpus-size wraps int64 long before it stresses decimal).
    */
  def sourceDivergence(spark: SparkSession, dir: String): DataFrame = {
    val d19 = DecimalType(19, 0)
    def d(c: Column) = c.cast(d19)
    val counts = Tables.documents(spark, dir)
      .select(col("source"), explode(split(trim(col("text")), " ")).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val a = counts.select(col("source").as("sa"), col("tok"), col("c").as("ca"))
    val b = counts.select(col("source").as("sb"), col("tok"), col("c").as("cb"))
    // both_num is already DECIMAL(38,0) from the summed products — never
    // re-cast it down to d19 (ANSI overflow); the one-sided tails promote
    // their FACTORS instead
    val num = col("both_num") +
      d(col("nb")) * (d(col("na")) - d(col("sca"))) +
      d(col("na")) * (d(col("nb")) - d(col("scb")))
    a.join(b, Seq("tok")).filter(col("sa") < col("sb"))
      .join(broadcast(totals.select(col("source").as("sa"), col("n").as("na"))), "sa")
      .join(broadcast(totals.select(col("source").as("sb"), col("n").as("nb"))), "sb")
      .groupBy(col("sa"), col("sb"), col("na"), col("nb"))
      .agg(
        count(lit(1)).as("n_common"),
        sum(col("ca")).as("sca"), sum(col("cb")).as("scb"),
        sum(abs(d(col("ca")) * d(col("nb")) - d(col("cb")) * d(col("na"))))
          .as("both_num"))
      .select(
        col("sa").as("source_a"), col("sb").as("source_b"), col("n_common"),
        (num.cast(DoubleType) /
          (lit(2L).cast(DecimalType(19, 0)) * d(col("na")) * d(col("nb")))
            .cast(DoubleType)).as("tv_distance"))
  }

  /** The PAIR-LOCAL generation-eval frame shared by [[bleuEval]] /
    * [[rougeEval]] / [[rougeLEval]]: reference = doc d, candidate = doc
    * d+1 (the adjacent-id convention the corpus's pair ops share —
    * ngram_jaccard's generator; a production run swaps in its real
    * (cand, ref) key), with each side's TOKEN ARRAY riding the join.
    *
    * Scale: this is the r13 rewrite of the r12 exploded plans, which
    * shuffled gram-instance STRINGS twice (a (doc, order, gram) tf
    * shuffle, then a (pair, order, gram) overlap-join re-shuffle — ~5
    * gram rows per token on the wire; bleu_eval was the registry's most
    * expensive op at 76.6 s/sf1x). Pairing is strictly (d, d+1), so each
    * document ships exactly TWICE (once as ref keyed d, once as cand
    * keyed d−1) through ONE equi-join shuffle of token arrays, and every
    * n-gram statistic is computed INSIDE the row by a codegen'd kernel
    * ([[graft.functions.ClippedNgramOverlaps]] /
    * [[graft.functions.LcsLength]]) — O(tokens) shuffle bytes, O(tokens ·
    * orders) bounded per-pair work, zero gram strings on the wire.
    */
  private def evalPairs(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
    base.select(col("doc_id").as("ref_id"), col("w").as("w_ref"))
      .join(base.select((col("doc_id") - 1).as("ref_id"),
        col("w").as("w_cand")), Seq("ref_id"))
  }

  private def clippedCol(maxOrder: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.ClippedNgramOverlaps(
        org.apache.spark.sql.GraftBridge.expression(col("w_ref")),
        org.apache.spark.sql.GraftBridge.expression(col("w_cand")),
        maxOrder))

  /** BLEU component evaluation over (reference, candidate) document
    * pairs — the precision-side metric (Papineni 2002): per n-gram order
    * n = 1..4, the CLIPPED match count m_n = Σ_g min(tf_cand, tf_ref)
    * (real BLEU's multiset-min, so a candidate repeating one reference
    * token can't inflate the match) and the candidate total c_n, with
    * p_n = m_n/c_n a single division of exact integers; brevity-penalty
    * INPUTS surface as exact lengths plus the `bp_applies` decision
    * (c_len < r_len). The scalar BLEU — BP·exp(Σ ln p_n / 4) — is
    * deliberately left to callers: exp/ln are not cross-engine
    * correctly-rounded and a fused scalar would also hide WHICH order
    * failed (the ECE / mutual-info / survival-product discipline;
    * callers get every exact ingredient).
    *
    * Scale: see [[evalPairs]] — one token-array join shuffle, all four
    * orders' clipped counts from one in-row kernel pass.
    */
  def bleuEval(spark: SparkSession, dir: String): DataFrame = {
    def d(c: Column) = c.cast(DoubleType)
    evalPairs(spark, dir)
      .withColumn("m", clippedCol(4))
      .select(
        col("ref_id") +: (col("ref_id") + 1).as("cand_id") +:
          size(col("w_ref")).cast(LongType).as("r_len") +:
          size(col("w_cand")).cast(LongType).as("c_len") +:
          (size(col("w_cand")) < size(col("w_ref"))).as("bp_applies") +:
          (1 to 4).flatMap { n =>
            val m = element_at(col("m"), n)
            val cn = greatest(size(col("w_cand")) - (n - 1), lit(0))
              .cast(LongType)
            Seq(m.as(s"m$n"), cn.as(s"c$n"),
              when(cn =!= 0, d(m) / d(cn)).as(s"p$n"))
          }: _*)
  }

  /** ROUGE-1/ROUGE-2 evaluation over the same (reference, candidate)
    * pairs — the n-gram-overlap metric every summarization / distillation
    * / paraphrase pipeline reports (Lin 2004), with the CLIPPED counts
    * real ROUGE uses. Precision/recall are single divisions of exact
    * integers; F1 uses the algebraic collapse 2PR/(P+R) = 2·ov/(n_ref +
    * n_cand) — ONE division over exact integers instead of a float chain
    * (the centroid_confusion F1 discipline). ROUGE-2 columns NULL-guard
    * the one-token-document case (n2 = 0).
    *
    * Scale: see [[evalPairs]] — one token-array join shuffle, both
    * orders' clipped counts from one in-row kernel pass.
    */
  def rougeEval(spark: SparkSession, dir: String): DataFrame = {
    def d(c: Column) = c.cast(DoubleType)
    val n1r = size(col("w_ref")).cast(LongType)
    val n1c = size(col("w_cand")).cast(LongType)
    val n2r = greatest(size(col("w_ref")) - 1, lit(0)).cast(LongType)
    val n2c = greatest(size(col("w_cand")) - 1, lit(0)).cast(LongType)
    val ov1 = element_at(col("m"), 1)
    val ov2 = element_at(col("m"), 2)
    evalPairs(spark, dir)
      .withColumn("m", clippedCol(2))
      .select(
        col("ref_id"), (col("ref_id") + 1).as("cand_id"),
        ov1.as("ov1"),
        n1r.as("n1_ref"), n1c.as("n1_cand"),
        (d(ov1) / d(n1c)).as("rouge1_p"),
        (d(ov1) / d(n1r)).as("rouge1_r"),
        (d(lit(2L) * ov1) / d(n1r + n1c)).as("rouge1_f"),
        ov2.as("ov2"),
        n2r.as("n2_ref"), n2c.as("n2_cand"),
        when(n2c =!= 0, d(ov2) / d(n2c)).as("rouge2_p"),
        when(n2r =!= 0, d(ov2) / d(n2r)).as("rouge2_r"),
        when(n2r + n2c =!= 0,
          d(lit(2L) * ov2) / d(n2r + n2c)).as("rouge2_f"))
  }

  /** ROUGE-L over the same (reference, candidate) pairs — the LCS-based
    * metric summarization evals report beside ROUGE-1/2 (Lin 2004 §3):
    * the longest common SUBSEQUENCE rewards in-order coverage without
    * requiring contiguity, so it sees sentence-level structure the fixed
    * n-gram orders miss. lcs is an exact integer from the in-row DP
    * kernel ([[graft.functions.LcsLength]], O(n·m) time / O(min-side)
    * space per pair); P = lcs/n_cand, R = lcs/n_ref, and F uses the same
    * exact-integer collapse 2·lcs/(n_ref + n_cand) as [[rougeEval]]
    * (β = 1). Token counts are ≥ 1 by construction (split of a non-null
    * string), so the divisions need no zero guards — the rouge1 column
    * convention.
    *
    * Scale: see [[evalPairs]]. Per-pair work is quadratic in document
    * length but documents are length-bounded upstream (gopher_rules /
    * content_filter cut the tail), and NO shuffle grows with it.
    */
  def rougeLEval(spark: SparkSession, dir: String): DataFrame = {
    def d(c: Column) = c.cast(DoubleType)
    val lcs = org.apache.spark.sql.GraftBridge.column(
      graft.functions.LcsLength(
        org.apache.spark.sql.GraftBridge.expression(col("w_ref")),
        org.apache.spark.sql.GraftBridge.expression(col("w_cand"))))
    val nr = size(col("w_ref")).cast(LongType)
    val nc = size(col("w_cand")).cast(LongType)
    evalPairs(spark, dir)
      .withColumn("lcs", lcs)
      .select(
        col("ref_id"), (col("ref_id") + 1).as("cand_id"),
        col("lcs"), nr.as("n_ref"), nc.as("n_cand"),
        (d(col("lcs")) / d(nc)).as("rougel_p"),
        (d(col("lcs")) / d(nr)).as("rougel_r"),
        (d(lit(2L) * col("lcs")) / d(nr + nc)).as("rougel_f"))
  }
}
