package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Tables

/** Data-quality layer — the generalization of the reference's single
  * freshness gate (airflow/dags/crypto_pipeline_monitor_dag.py:22-28, a
  * SQLCheckOperator failing on a falsy COUNT) into the two standard DQ
  * primitives a production pipeline runs before publishing a table:
  * a column profiler and a rule-violation counter.
  *
  * Scale posture: every op is ONE pass over the fact table with map-side
  * partial aggregation — profiling 100 TB costs one scan, never a scan per
  * column or per rule. The EXACT profiler's distinct counts expand the scan
  * k-ways (Spark's multi-distinct Expand); the approx profiler replaces
  * them with deterministic KMV sketches (no expansion, one 8 KB sketch
  * per column, hash-checked since r16 — see [[profileColumnsApprox]]);
  * the rule counter is a pure conditional aggregate (zero
  * expansion). Output is long-form (one row per column / per rule) so
  * downstream gates can join or alert on it relationally — the monitor-DAG
  * pattern, made data.
  */
object QualityOps {

  /** Engine-stable min/max rendering: longs/strings verbatim, timestamps
    * second-truncated, doubles through DECIMAL(18,2) (binary doubles print
    * differently across engines; the fixed-scale decimal form is identical
    * everywhere).
    */
  private def asStr(c: Column, dt: String): Column = dt match {
    case "ts"  => date_format(c, "yyyy-MM-dd HH:mm:ss")
    case "dbl" => c.cast(DecimalType(18, 2)).cast(StringType)
    case _     => c.cast(StringType)
  }

  /** (name, datatype tag) of every profiled column — public: the approx
    * profiler's oracle SQL generates one UNION arm per entry.
    */
  val ProfiledCols = Seq(
    ("event_id", "long"), ("ts", "ts"), ("user_id", "long"),
    ("event_type", "str"), ("value", "dbl"), ("props", "str"))

  /** DuckDB twin of [[hashRendering]] — kept adjacent so the two sides of
    * the KMV hash input can never drift.
    */
  def duckHashRendering(n: String, dt: String): String = dt match {
    case "ts"  => s"CAST(epoch_us($n) AS VARCHAR)"
    case "dbl" => s"CAST(CAST($n AS DECIMAL(18,2)) AS VARCHAR)"
    case _     => s"CAST($n AS VARCHAR)"
  }

  /** Shared profiler body — the exact and approx profilers differ only in
    * the distinct aggregate (which also sees the column's datatype tag)
    * and its output alias.
    */
  private def profile(spark: SparkSession, dir: String,
                      distinctAgg: (Column, String) => Column,
                      distinctAlias: String): DataFrame = {
    val aggs = ProfiledCols.flatMap { case (n, dt) =>
      Seq(
        sum(when(col(n).isNull, 1L).otherwise(0L)).as(s"${n}_nulls"),
        distinctAgg(col(n), dt).as(s"${n}_distinct"),
        min(col(n)).as(s"${n}_min"),
        max(col(n)).as(s"${n}_max"))
    }
    // balanced: the events parquet is ONE scan split, so the Expand(×7) +
    // partial multi-distinct aggregation ran on a single task (1.6 s of
    // profile_columns' 2.6 s at sf0.1, r17 profile). Round-robin to core
    // count first — the partial agg is the CPU; the repartition is a ~2 MB
    // shuffle and a no-op at production scale (guide §2.5).
    val one = Tables.balanced(Tables.events(spark, dir))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
    val rows = ProfiledCols.map { case (n, dt) =>
      struct(
        lit(n).as("col_name"),
        col("n_rows"),
        col(s"${n}_nulls").as("n_nulls"),
        col(s"${n}_distinct").as(distinctAlias),
        asStr(col(s"${n}_min"), dt).as("min_value"),
        asStr(col(s"${n}_max"), dt).as("max_value"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Single-scan column profiler over events: per column, the row count,
    * NULL count, exact distinct count, and min/max rendered as strings
    * (see [[asStr]] for the engine-stable rendering rules).
    */
  def profileColumns(spark: SparkSession, dir: String): DataFrame =
    profile(spark, dir, (c, _) => countDistinct(c), "n_distinct")

  /** KMV sketch size for the approx profiler — public: the oracle SQL
    * interpolates it (k-th smallest OFFSET, estimator factor k−1, and the
    * exact-regime boundary all derive from this one val).
    */
  val ProfileKmvK = 1024

  /** The engine-stable rendering each column is HASHED under for the KMV
    * distinct sketch. Longs/strings verbatim; timestamps as epoch MICROS
    * (lossless — the display rendering truncates to seconds and would
    * merge distinct values); doubles through DECIMAL(18,2) (lossless on
    * this data — the fixture's values are 2-decimal — and the only
    * cross-engine-stable double rendering).
    */
  private def hashRendering(c: Column, dt: String): Column = dt match {
    case "ts"  => unix_micros(c).cast(StringType)
    case "dbl" => c.cast(DecimalType(18, 2)).cast(StringType)
    case _     => c.cast(StringType)
  }

  /** The 100 TB profiler: same long-form output as [[profileColumns]] but
    * distinct counts come from a KMV sketch
    * ([[graft.functions.KmvSketch]], k = [[ProfileKmvK]]) — no
    * multi-distinct Expand, so the single scan shuffles one 8 KB sketch
    * per column instead of re-keying the data k ways. Unlike the HLL++
    * form this op previously used, KMV state (the k smallest distinct
    * md5-hashes) is merge-order independent and SQL-replayable, so
    * `n_distinct_est` is hash-checked against a DuckDB replay of the same
    * estimator — graduated from rows-only in r16. Estimates are EXACT for
    * columns with fewer than k distinct values (event_type here) and
    * carry ~1/√(k−2) ≈ 3.1% relative error above that.
    * Min/max/null columns are identical to the exact form.
    */
  def profileColumnsApprox(spark: SparkSession, dir: String): DataFrame = {
    val kmv = udaf(new graft.functions.KmvSketch(ProfileKmvK))
    profile(spark, dir,
      (c, dt) => kmv(graft.functions.KmvSketch.hash60(hashRendering(c, dt))),
      "n_distinct_est")
  }

  /** The shared CHECK-rule catalog: (rule name, VIOLATION predicate).
    * [[dqChecks]] counts violations per rule; [[dqQuarantine]] emits the
    * violating rows themselves. One definition so gate and quarantine can
    * never drift.
    */
  private def dqRules: Seq[(String, Column)] = {
    val known = Seq("click", "error", "purchase", "signup", "view")
    Seq(
      ("value_positive", col("value") <= 0.0),
      ("value_below_100", col("value") > 100.0),
      ("ts_in_january", col("ts") < lit("2024-01-01 00:00:00").cast(TimestampType) ||
        col("ts") >= lit("2024-02-01 00:00:00").cast(TimestampType)),
      ("event_type_known", !col("event_type").isin(known: _*)),
      ("user_id_present", col("user_id").isNull),
      ("props_has_k", get_json_object(col("props"), "$.k").isNull),
      ("purchase_value_min_10", col("event_type") === "purchase" && col("value") < 10.0))
  }

  /** Declarative rule-violation counter — the CHECK-constraint audit: each
    * rule is a boolean predicate over events, and the op reports how many
    * rows violate it plus the violation rate (exact long counts, ONE final
    * IEEE division). Rules with zero violations still surface (a gate must
    * distinguish "checked, clean" from "not checked"). One conditional
    * aggregation, no expansion, no second scan.
    */
  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val rules = dqRules
    val aggs = rules.map { case (n, pred) =>
      sum(when(pred, 1L).otherwise(0L)).as(n)
    }
    val one = Tables.events(spark, dir)
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
    val rows = rules.map { case (n, _) =>
      struct(
        lit(n).as("rule"),
        col(n).as("n_violations"),
        col("n_rows"),
        (col(n).cast(DoubleType) / col("n_rows").cast(DoubleType))
          .as("violation_rate"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** The quarantine half of the DQ layer: the VIOLATING ROWS themselves,
    * one output row per (event, violated rule) — what a pipeline routes to
    * a dead-letter table while the clean subset proceeds. ONE scan: every
    * rule evaluates in a single projection into an array of fired rule
    * names, the explode drops clean rows for free (empty array ⇒ no rows),
    * and output size is bounded by the violation count, not the corpus.
    * The rule catalog is [[dqRules]], shared with [[dqChecks]], so the
    * gate's counts and the quarantine's rows always agree.
    */
  def dqQuarantine(spark: SparkSession, dir: String): DataFrame = {
    val fired = array(dqRules.map { case (n, pred) => when(pred, lit(n)) }: _*)
    Tables.events(spark, dir)
      .select(col("event_id"),
        explode(filter(fired, x => x.isNotNull)).as("rule"))
  }

  /** Target rows per post-salt shuffle task for [[saltPlan]] — public so
    * the oracle SQL interpolates THIS value. Small so the fixture's key
    * counts exercise both plan branches (n_salts = 1 at sf0.001 where
    * per-type counts sit near 200; 4-5 at sf0.01; ~40 at sf0.1); a
    * deployment sets it from executor task sizing.
    */
  val SaltTargetRows = 500L

  /** Per-key salting PLAN — the remediation table between
    * [[skewReport]]'s diagnosis and `join_skew_salted`'s mechanism: for
    * every join/group key, the salt fan-out a pipeline should apply so no
    * single post-shuffle task exceeds [[SaltTargetRows]] rows. n_salts =
    * ⌈cnt / target⌉ in pure BIGINT ceil-division (1 for cold keys — the
    * no-op salt), and post_rows_max = ⌈cnt / n_salts⌉ is the guaranteed
    * per-task bound the plan promises (a uniform hash salt splits a key's
    * rows into n_salts near-equal slices; the ceiling is exact worst
    * case for the deterministic mod-salt `join_skew_salted` applies).
    * Keyed here on event_type — the fixture's genuinely hot dimension
    * (5 keys × ~20 k rows each at sf0.1, every one needing a fan-out of
    * ~40) — where user_id's ~66-row keys all plan n_salts = 1.
    *
    * Scale: one map-side-combined count per key; the plan frame is
    * key-cardinality-sized, broadcastable back into the salted join.
    * Fully oracle-checked (integer arithmetic end to end).
    */
  def saltPlan(spark: SparkSession, dir: String): DataFrame =
    saltAdvisory(
      Tables.events(spark, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt")))

  /** The salt arithmetic alone, over ANY per-key `cnt` frame — shared by
    * the batch [[saltPlan]] and the streaming
    * [[graft.streaming.SkewAdvisorStream]] twin so the two can never
    * drift (the dqRules single-catalog discipline).
    */
  def saltAdvisory(counts: DataFrame): DataFrame =
    counts
      .withColumn("n_salts",
        expr(s"(cnt + ${SaltTargetRows - 1}) div $SaltTargetRows"))
      .withColumn("post_rows_max", expr("(cnt + n_salts - 1) div n_salts"))

  /** Join-key skew report — the diagnostic a pipeline runs BEFORE a big
    * join to decide whether it needs salting/AQE skew handling (the
    * engine's own `join_skew_salted` is the remedy; this is the detector).
    * One groupBy collapses the fact table to per-key counts (partial agg
    * map-side — the shuffle carries keys, not rows), then one tiny
    * aggregate over ~|keys| rows derives the shape: top-key share and the
    * p50/p99 per-key-count quantiles whose ratio is the skew signal.
    * Exact percentiles are fine HERE because the input is already
    * key-cardinality-sized — running them on raw rows would be the
    * anti-pattern ([[StatsOps.kllPartialUnion]] is that scale path).
    */
  def skewReport(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      .agg(
        sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_cnt"),
        expr("percentile(cnt, 0.5)").as("p50_cnt"),
        expr("percentile(cnt, 0.99)").as("p99_cnt"))
      .withColumn("top_share",
        col("max_cnt").cast(DoubleType) / col("n_rows").cast(DoubleType))

  /** Distribution-drift histogram — the population-stability check a
    * pipeline runs between a reference window and the current one: the
    * REFERENCE half's exact value deciles become fixed bin cuts, both
    * halves are binned against them, and the op reports per-bin exact
    * counts plus the share gap (current − reference). Flat reference
    * shares (~0.1) with skewed current shares = drift. One pass over the
    * series after a broadcast of the 9 cuts; per-bin output keeps every
    * reported float a PER-ROW expression — a summed PSI (Σ(q−p)·ln(q/p))
    * would hash-diverge two ways (cross-bin float addition order, and ln
    * is not correctly-rounded across libm implementations), which is why
    * the ln-free histogram IS the contract and any scalar drift score
    * derives client-side.
    */
  def decileDrift(spark: SparkSession, dir: String): DataFrame = {
    val split = lit("2024-01-16 00:00:00").cast(TimestampType)
    val ev = Tables.events(spark, dir)
      .select(col("value"), (col("ts") < split).as("is_ref"))
    // Decile cuts by EXACT integer rank over the per-distinct-value count
    // summary — never an interpolated percentile: Spark's `percentile`
    // and the oracle engine's `quantile_cont` interpolate with different
    // IEEE expression shapes, and a 1-ulp cut difference shifts whole
    // rows across bins (an integer-count hash mismatch, data-dependent).
    // cut_k = smallest value whose cumulative ref count reaches k·n/10,
    // tested as `cum·10 ≥ k·n` in pure integers — bit-identical in any
    // engine, and every cut is an actual data value (each grid cell's
    // MIN observed value represents it, so no decode division re-enters
    // float land). The count summary is QUANTIZED to a fixed 0.01 grid
    // (integer cents) before the rank window: a continuous metric's
    // distinct-value "summary" is ≈ row cardinality, but the cents grid
    // is bounded by the VALUE RANGE (max_value·100 cells) no matter how
    // many rows flow in — only that range-bounded frame ever crosses
    // the single-partition cumsum. On 2-decimal data (the events.value
    // contract) the grid is lossless, so cuts — and the oracle — are
    // unchanged.
    val wCum = org.apache.spark.sql.expressions.Window.orderBy(col("cell"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cc = ev.filter(col("is_ref"))
      .withColumn("cell", round(col("value") * 100).cast(LongType))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("c"), min(col("value")).as("value"))
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", expr("sum(c) over ()"))
    val cutCols = (1 to 9).map(k =>
      min(when(col("cum") * 10 >= lit(k) * col("n"), col("value")))
        .as(s"c$k"))
    val cuts = cc.agg(cutCols.head, cutCols.tail: _*)
      .select(array((1 to 9).map(k => col(s"c$k")): _*).as("cuts"))
    ev.crossJoin(broadcast(cuts))
      .select(col("is_ref"),
        expr("1 + size(filter(cuts, c -> value > c))").as("bin"))
      .groupBy(col("bin"))
      .agg(
        count(when(col("is_ref"), 1)).as("ref_cnt"),
        count(when(!col("is_ref"), 1)).as("cur_cnt"))
      .select(col("bin"), col("ref_cnt"), col("cur_cnt"),
        (col("ref_cnt").cast(DoubleType) /
          expr("sum(ref_cnt) over ()").cast(DoubleType)).as("ref_share"),
        (col("cur_cnt").cast(DoubleType) /
          expr("sum(cur_cnt) over ()").cast(DoubleType)).as("cur_share"),
        (col("cur_cnt").cast(DoubleType) /
          expr("sum(cur_cnt) over ()").cast(DoubleType) -
         col("ref_cnt").cast(DoubleType) /
          expr("sum(ref_cnt) over ()").cast(DoubleType)).as("share_gap"))
  }

  /** Benford's-law expected first-digit shares, log10(1 + 1/d), as exact
    * double LITERALS — computing them with `log10` at runtime would put a
    * non-correctly-rounded libm call in an oracle-hashed output (the
    * engine's no-log discipline); the literal text appears symbol-for-
    * symbol in the oracle SQL (E-notation there, so DuckDB parses DOUBLE,
    * not DECIMAL).
    */
  private[graft] val BenfordShares: Seq[(Int, Double)] = Seq(
    1 -> 0.3010299956639812, 2 -> 0.17609125905568124, 3 -> 0.12493873660829992,
    4 -> 0.09691001300805642, 5 -> 0.07918124604762482, 6 -> 0.06694678963061322,
    7 -> 0.05799194697768673, 8 -> 0.05115252244738129, 9 -> 0.04575749056067514)

  /** Benford's-law conformance of order totals: observed vs expected
    * first-significant-digit distribution plus each digit's χ² term — the
    * classic fabricated-amounts fraud screen. The digit is extracted by
    * STRING head of the exact integer cents (prices are 2-decimal and
    * ≥ 0.01, so no leading zero/sign cases exist) — log-free, hence
    * oracle-hashable. One scan, 9-group aggregate, broadcast total; the
    * χ² algebra is plain +,·,/ over the exact counts.
    */
  def benfordCheck(spark: SparkSession, dir: String): DataFrame = {
    val digit = substring(
      round(col("o_totalprice") * 100).cast(LongType).cast(StringType), 1, 1)
      .cast(IntegerType)
    val expected = element_at(
      map(BenfordShares.flatMap { case (d, e) => Seq(lit(d), lit(e)) }: _*),
      col("digit"))
    val g = Tables.orders(spark, dir)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("obs"))
    val t = g.agg(sum(col("obs")).as("n"))
    val nD = col("n").cast(DoubleType)
    val obsD = col("obs").cast(DoubleType)
    g.crossJoin(broadcast(t))
      // match the oracle's INNER join against the 9-row expected table: a
      // degenerate price rounding to 0 cents yields digit 0, which must be
      // a dropped row on BOTH engines (not a NULL-expected row here) — n
      // still counts it, exactly as the oracle's `t` does
      .filter(col("digit").between(1, 9))
      .withColumn("expected", expected)
      .select(
        col("digit"), col("obs"),
        (obsD / nD).as("share"),
        col("expected"),
        ((obsD - nD * col("expected")) * (obsD - nD * col("expected")) /
          (nD * col("expected"))).as("chi_term"))
  }

  /** Categorical purity profile of the documents corpus: per column, the
    * group count, Gini impurity 1 − Σp², and the modal share — the
    * class-balance report a training-data pipeline gates corpus mixes on.
    * Gini replaces Shannon entropy BY DESIGN: it is the same concentration
    * ordering with +,·,/ only (entropy's ln is not correctly-rounded
    * across engines — no-log discipline). One count-per-value aggregate
    * per column (shuffles carry (value, count) pairs, never rows), squared
    * counts promoted to DECIMAL(38,0)/HUGEINT — at 100 TB a modal class
    * count squared overflows int64.
    */
  def giniProfile(spark: SparkSession, dir: String): DataFrame = {
    val d19 = DecimalType(19, 0)
    def profileCol(name: String): DataFrame =
      Tables.documents(spark, dir)
        .groupBy(col(name).as("v")).agg(count(lit(1)).as("c"))
        .agg(
          count(lit(1)).as("n_groups"),
          sum(col("c")).as("n"),
          sum(col("c").cast(d19) * col("c").cast(d19)).as("s2"),
          max(col("c")).as("mx"))
        .select(
          lit(name).as("col_name"), col("n_groups"), col("n"),
          (lit(1.0) - col("s2").cast(DoubleType) /
            (col("n").cast(DoubleType) * col("n").cast(DoubleType))).as("gini"),
          (col("mx").cast(DoubleType) / col("n").cast(DoubleType)).as("top_share"))
    profileCol("lang").unionAll(profileCol("source"))
  }

  /** Referential-integrity audit of the star schema: for each declared
    * FK edge, the fact row count, rows whose key misses the dimension
    * (orphans), and the orphan rate — the join-will-silently-drop-rows
    * gate run before any fact/dim join ships. Each edge is ONE left join
    * collapsed to a two-number aggregate (null-count pattern) — shuffles
    * carry keys only, dimension PKs are unique so the join never fans
    * out, and AQE broadcasts genuinely small dims at runtime.
    */
  def orphanFkCheck(spark: SparkSession, dir: String): DataFrame = {
    def edge(name: String, fact: DataFrame, fk: String,
             dim: DataFrame, pk: String): DataFrame =
      fact.select(col(fk).as("k"))
        .join(dim.select(col(pk).as("dk")), col("k") === col("dk"), "left")
        .agg(
          count(lit(1)).as("total"),
          sum(when(col("dk").isNull, 1L).otherwise(0L)).as("orphans"))
        .select(
          lit(name).as("fk"), col("total"), col("orphans"),
          (col("orphans").cast(DoubleType) / col("total").cast(DoubleType))
            .as("orphan_rate"))
    val li = Tables.lineitem(spark, dir)
    edge("lineitem.l_orderkey->orders", li, "l_orderkey",
        Tables.orders(spark, dir), "o_orderkey")
      .unionAll(edge("lineitem.l_partkey->part", li, "l_partkey",
        Tables.part(spark, dir), "p_partkey"))
      .unionAll(edge("lineitem.l_suppkey->supplier", li, "l_suppkey",
        Tables.supplier(spark, dir), "s_suppkey"))
      .unionAll(edge("orders.o_custkey->customer", Tables.orders(spark, dir),
        "o_custkey", Tables.customer(spark, dir), "c_custkey"))
  }

  /** Gopher-style repetition/quality rules (Rae et al. 2021 §A1.1, the
    * rule family RefinedWeb/Dolma reuse), adapted to word granularity:
    * per document — word count, mean word length, the word-coverage
    * fraction of the single most frequent 2-gram, the fraction of
    * REPEATED 3-gram instances (occurrences beyond each gram's first),
    * the distinct-word fraction, and how many distinct stopwords appear;
    * each signal gated by a published-shape threshold and an overall
    * `keep`. Ratios are exact integer/integer single divisions (oracle-
    * safe); thresholds live in [[GopherThresholds]] and are interpolated
    * into the oracle SQL, never duplicated.
    *
    * Scale: the whole op is ONE map-side pass — per-doc arrays, a sorted
    * run-length fold for the max 2-gram multiplicity (`aggregate` over
    * `sort_array`, pure codegen), `array_distinct` for the repetition
    * and vocabulary fractions. No explode, no shuffle, no join: profiling
    * 100 TB costs exactly one scan. The DuckDB oracle unnests and
    * re-groups instead (clarity over speed) — same numbers.
    */
  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    import GopherThresholds._
    val stopArr = array(StopWords.map(lit): _*)
    // max multiplicity of any element in a SORTED array: run-length fold
    // (the IF is repeated for `mx` because a lambda struct field cannot
    // reference a sibling computed in the same step)
    def maxMult(sorted: Column): Column = {
      val agg = aggregate(sorted,
        struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("mx")),
        (acc, g) => struct(
          g.as("prev"),
          when(g === acc.getField("prev"), acc.getField("run") + 1)
            .otherwise(lit(1)).as("run"),
          greatest(acc.getField("mx"),
            when(g === acc.getField("prev"), acc.getField("run") + 1)
              .otherwise(lit(1))).as("mx")))
      agg.getField("mx")
    }
    Tables.documents(spark, dir)
      .withColumn("w", split(trim(col("text")), " "))
      .withColumn("n", size(col("w")))
      // n-guards: Spark's sequence(1, 0) DESCENDS ([1, 0]) instead of
      // being empty, so a 1-2 word doc would index past the array (ANSI
      // INVALID_ARRAY_INDEX) without the explicit CASE
      .withColumn("g2", expr(
        "IF(n >= 2, transform(sequence(1, n - 1), i -> concat(w[i-1], ' ', w[i])), array())"))
      .withColumn("g3", expr(
        "IF(n >= 3, transform(sequence(1, n - 2), i -> concat(w[i-1], ' ', w[i], ' ', w[i+1])), array())"))
      .select(
        col("doc_id"),
        col("n").as("n_words"),
        (aggregate(col("w"), lit(0L), (acc, t) => acc + length(t))
          .cast(DoubleType) / col("n")).as("mean_word_len"),
        when(size(col("g2")) > 0,
          maxMult(sort_array(col("g2"))) * 2.0 / col("n"))
          .otherwise(lit(0.0)).as("top2_frac"),
        when(size(col("g3")) > 0,
          (size(col("g3")) - size(array_distinct(col("g3"))))
            .cast(DoubleType) / size(col("g3")))
          .otherwise(lit(0.0)).as("dup3_frac"),
        (size(array_distinct(col("w"))).cast(DoubleType) / col("n"))
          .as("uniq_frac"),
        size(array_intersect(array_distinct(col("w")), stopArr))
          .as("stop_hits"))
      .withColumn("keep",
        (col("n_words") >= MinWords && col("n_words") <= MaxWords &&
          col("mean_word_len") >= MinMeanLen && col("mean_word_len") <= MaxMeanLen &&
          col("top2_frac") <= MaxTop2Frac &&
          col("dup3_frac") <= MaxDup3Frac &&
          col("uniq_frac") >= MinUniqFrac &&
          col("stop_hits") >= MinStopHits).cast(IntegerType))
  }

  /** Shared engine/oracle constants for [[gopherRules]] — public so the
    * oracle SQL interpolates THESE values (the MaxBucket discipline:
    * retuning can never silently diverge engine and oracle). Word-count,
    * mean-length and stop-hit gates keep Gopher's published shape; the
    * repetition gates sit at this corpus's observed medians so both
    * branches of every flag are exercised by the fixture.
    */
  object GopherThresholds {
    val MinWords = 40
    val MaxWords = 100000
    val MinMeanLen = 3.0
    val MaxMeanLen = 10.0
    val MaxTop2Frac = 0.08
    val MaxDup3Frac = 0.02
    val MinUniqFrac = 0.45
    val MinStopHits = 2
    val StopWords: Seq[String] = Seq("the", "a", "and", "of", "to", "with")
  }

  /** Group-size threshold below which a quasi-identifier group counts as
    * re-identification risk in [[kAnonymity]] — public so the oracle SQL
    * interpolates THIS value (the MaxBucket discipline).
    */
  val KAnonThreshold = 5

  /** k-anonymity audit over the customer table — the governance check a
    * release gate runs beside [[TextOps.piiRedact]] before a dataset
    * ships: for each level of a quasi-identifier generalization ladder
    * (nation+segment → region+segment → segment), the group census, the
    * realized k (smallest group), and how many rows/groups sit below the
    * risk threshold. Generalizing UP the ladder (nation→region→drop) is
    * exactly the suppression a curator applies when min_k is too small,
    * so the three rows ARE the remediation menu. All-integer output.
    *
    * Scale: the region key rides a BROADCAST nation join; each ladder
    * level is a two-stage aggregation whose first stage combines map-side
    * and whose second consumes only the QI-cardinality group frame —
    * three bounded passes, no row-level shuffle beyond the group keys.
    */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val k = lit(KAnonThreshold)
    val nat = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_regionkey"))
    val base = Tables.customer(spark, dir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
    def level(name: String, keys: Column*): DataFrame =
      base.groupBy(keys: _*).agg(count(lit(1)).as("grp"))
        .agg(
          lit(name).as("level"),
          count(lit(1)).as("n_groups"),
          min(col("grp")).as("min_k"),
          sum(when(col("grp") < k, col("grp")).otherwise(0L)).as("rows_at_risk"),
          sum(when(col("grp") < k, 1L).otherwise(0L)).as("groups_at_risk"))
    level("nation_segment", col("c_nationkey"), col("c_mktsegment"))
      .unionByName(level("region_segment", col("n_regionkey"), col("c_mktsegment")))
      .unionByName(level("segment", col("c_mktsegment")))
  }

  /** PLACEHOLDER blocklist for [[contentFilter]] — stands in for a
    * production lexicon (the C4 badwords list, a PII-pattern lexicon, a
    * compliance term list); the fixture corpus has no real profanity, so
    * the list names one term that occurs (~5% of docs at every SF — both
    * gate directions non-vacuous) and two that never do (the no-hit path
    * stays exercised). Public so the oracle SQL interpolates THESE terms.
    */
  val BlockedTerms: Seq[String] = Seq("dup", "forbidden", "redacted")

  /** Render a string as an ANSI SQL literal for the DuckDB oracle:
    * single quotes double ('' — the only escape standard strings have;
    * backslash is a literal character there). The Spark side never
    * interpolates terms into SQL at all ([[contentFilter]] builds Column
    * literals), so this is the one remaining text boundary a hostile
    * lexicon entry could cross.
    */
  def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Lexicon-based content filter — the C4-shape badwords gate (Raffel
    * et al. 2020 §2.2: drop any document containing a blocklisted word)
    * every production corpus pipeline runs in some form: per document,
    * the blocked-token hit count, the DISTINCT blocked terms hit, and
    * the keep verdict (zero hits). Exact whole-token matching over the
    * same whitespace tokenization as the rest of the corpus-prep layer
    * — never substring matching, which blocks "classic" for "ass"
    * (the Scunthorpe failure).
    *
    * Scale: ONE map-side pass — per-doc array fold against the literal
    * term array, no explode, no join, no shuffle; at 100 TB a real
    * (thousands-entry) lexicon would broadcast or compile into a
    * native Expression, the plan shape is unchanged.
    */
  def contentFilter(spark: SparkSession, dir: String): DataFrame = {
    // terms enter the plan as Column literals, never via string
    // interpolation into SQL text — a future lexicon entry containing a
    // quote/backslash/metacharacter cannot break or inject into the query
    // (the oracle side escapes with SqlLit for the same reason)
    val terms = array(BlockedTerms.map(lit): _*)
    Tables.documents(spark, dir)
      .withColumn("w", split(trim(col("text")), " "))
      .select(col("doc_id"), col("source"),
        size(filter(col("w"), x => array_contains(terms, x)))
          .cast(IntegerType).as("n_hits"),
        size(array_intersect(col("w"), terms))
          .cast(IntegerType).as("n_terms_hit"))
      .withColumn("keep", col("n_hits") === 0)
  }

  /** Distinct-sensitive-value floor below which a quasi-identifier group
    * counts as attribute-disclosure risk in [[lDiversity]] — public so
    * the oracle SQL interpolates THIS value (the MaxBucket discipline).
    */
  val LDivThreshold = 3

  /** l-diversity audit — the attribute-disclosure companion to
    * [[kAnonymity]] (Machanavajjhala et al. 2007): a group can satisfy
    * k-anonymity and still leak if every member shares the SAME
    * sensitive value, so the release gate also requires each
    * quasi-identifier group to contain at least l distinct sensitive
    * values. Sensitive attribute: the account-balance band
    * `floor(c_acctbal / 1000)` (floor of one IEEE division — exact and
    * engine-identical, never a rounding-mode hazard). For each level of
    * the same generalization ladder as kAnonymity (nation+segment →
    * region+segment → segment): group count, realized l (smallest
    * distinct-band count), and the groups/rows below [[LDivThreshold]].
    * All-integer output.
    *
    * Scale: the region key rides the same BROADCAST nation join; each
    * level is a two-stage aggregation — the distinct-count stage
    * partial-aggregates (QI, band) map-side, the census consumes only
    * the QI-cardinality group frame.
    */
  def lDiversity(spark: SparkSession, dir: String): DataFrame = {
    val l = lit(LDivThreshold)
    val nat = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_regionkey"))
    val base = Tables.customer(spark, dir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .withColumn("band", floor(col("c_acctbal") / lit(1000.0)))
    def level(name: String, keys: Column*): DataFrame =
      base.groupBy(keys: _*)
        .agg(countDistinct(col("band")).as("l"), count(lit(1)).as("grp"))
        .agg(
          lit(name).as("level"),
          count(lit(1)).as("n_groups"),
          min(col("l")).as("min_l"),
          sum(when(col("l") < l, 1L).otherwise(0L)).as("groups_below"),
          sum(when(col("l") < l, col("grp")).otherwise(0L)).as("rows_at_risk"))
    level("nation_segment", col("c_nationkey"), col("c_mktsegment"))
      .unionByName(level("region_segment", col("n_regionkey"), col("c_mktsegment")))
      .unionByName(level("segment", col("c_mktsegment")))
  }

  /** EMD ceiling for [[tCloseness]] as an exact rational t = num/den
    * (0.2) — public so the oracle SQL interpolates THESE integers and
    * the violation test stays a pure integer cross-multiplication (the
    * decile_drift no-division discipline).
    */
  val TCloseNum = 1
  val TCloseDen = 5

  /** t-closeness audit — the third leg of the governance triad
    * (Li, Li & Venkatasubramanian 2007): a group can be k-anonymous AND
    * l-diverse yet still leak if its sensitive-value DISTRIBUTION skews
    * far from the table's (all its balances in the top band, say), so
    * the gate bounds the Earth Mover's Distance between each
    * quasi-identifier group's band distribution and the global one. Over
    * the SAME ordered band ladder as [[lDiversity]]
    * (floor(c_acctbal/1000)), ordered-distribution EMD is the prefix-sum
    * identity EMD = (1/(B−1))·Σ_j |P_j/n_c − Q_j/n_t| — and clearing
    * denominators makes every group's numerator
    * `emd_num = Σ_j |P_j·n_t − Q_j·n_c|` EXACT BIGINT arithmetic: the
    * violation test t·den < num cross-multiplies integers
    * ([[TCloseNum]]/[[TCloseDen]]), the realized per-group EMD is ONE
    * boundary division of exact integers (max over those doubles is
    * order-independent), and the census per ladder level reports
    * groups/rows past the ceiling. All other columns integer.
    *
    * Scale: ONE fact scan builds the checkpointed
    * (nation, region, segment, band) cell frame (≤ |QI|·|bands| rows at
    * ANY population — the mutualInfo cell discipline); the band ladder,
    * every ladder level, and the group×band grid all derive from those
    * cells, with the grid bounded by groups·bands, never rows. Products
    * P_j·n_t stay in int64 up to ~3e9 rows; past that promote the
    * factors to DECIMAL (the chi_square guard pattern).
    */
  def tCloseness(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nat = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_regionkey"))
    val cells = Tables.ckpt(
      Tables.customer(spark, dir)
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .withColumn("band", floor(col("c_acctbal") / lit(1000.0)))
        .groupBy(col("c_nationkey"), col("n_regionkey"), col("c_mktsegment"),
          col("band"))
        .agg(count(lit(1)).as("cnt")))
    // global ordered ladder: per band the cumulative census Q_j, plus the
    // table totals — a bands-cardinality frame, always broadcastable
    val wq = Window.orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bands = cells.groupBy(col("band")).agg(sum(col("cnt")).as("g"))
      .withColumn("g_cum", sum(col("g")).over(wq))
      .drop("g")
    val tot = cells.agg(
      sum(col("cnt")).as("n_t"),
      countDistinct(col("band")).as("n_bands"))
    val ladder = broadcast(bands.crossJoin(broadcast(tot)))

    def level(name: String, keys: Seq[String]): DataFrame = {
      val kc = keys.map(col)
      val cls = cells.groupBy(kc: _*).agg(sum(col("cnt")).as("n_c"))
      val cnts = cells.groupBy(kc :+ col("band"): _*).agg(sum(col("cnt")).as("cnt"))
      val wp = Window.partitionBy(kc: _*).orderBy(col("band"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val den = (col("n_bands") - 1) * col("n_c") * col("n_t")
      val perClass = cls.join(ladder) // grid: every group × every band
        .join(cnts, keys :+ "band", "left")
        .withColumn("p_cum",
          sum(coalesce(col("cnt"), lit(0L))).over(wp))
        .withColumn("term",
          abs(col("p_cum") * col("n_t") - col("g_cum") * col("n_c")))
        .groupBy(kc: _*)
        .agg(min(col("n_c")).as("n_c"), min(col("n_t")).as("n_t"),
          min(col("n_bands")).as("n_bands"), sum(col("term")).as("emd_num"))
        .withColumn("den", den)
        .withColumn("emd",
          when(col("den") =!= 0,
            col("emd_num").cast(DoubleType) / col("den").cast(DoubleType)))
        .withColumn("violating",
          col("emd_num") * TCloseDen > col("den") * TCloseNum)
      perClass.agg(
        lit(name).as("level"),
        count(lit(1)).as("n_groups"),
        max(col("emd")).as("max_t"),
        sum(when(col("violating"), 1L).otherwise(0L)).as("groups_violating"),
        sum(when(col("violating"), col("n_c")).otherwise(0L)).as("rows_at_risk"))
    }
    level("nation_segment", Seq("c_nationkey", "c_mktsegment"))
      .unionByName(level("region_segment", Seq("n_regionkey", "c_mktsegment")))
      .unionByName(level("segment", Seq("c_mktsegment")))
  }

  /** Screening z-threshold for [[watermarkDetect]] — public so the oracle
    * SQL interpolates THIS literal. 2.0 is a triage threshold (≈2.3% of
    * clean docs flag for review); a production detector confirming
    * watermarks uses ~4.
    */
  val WatermarkZ = 2.0

  /** Greenlist watermark detection — the screen a training-data pipeline
    * runs for LLM-watermarked synthetic text (Kirchenbauer et al. 2023:
    * a watermarking sampler boosts a prev-token-keyed pseudorandom
    * "green" half of the vocabulary, so watermarked text shows a green
    * excess any party with the hash can detect): per document, score
    * each token against the greenlist keyed by its predecessor —
    * green ⟺ the first hex digit of md5(prev ⊔ ' ' ⊔ cur) ≤ '7', an
    * exactly-γ=1/2 pseudorandom partition BOTH engines compute
    * byte-identically (md5 is fully specified; the hex compare is a
    * string compare) — and report the hit count, fraction, and the
    * one-proportion z statistic, which at γ = 1/2 collapses to
    * z = (2G − T)/√T: exact integers into ONE division over one
    * IEEE-exact sqrt, no transcendental anywhere. Docs with < 2 tokens
    * score nothing (null fraction/z, unflagged). The fixture corpus is
    * unwatermarked, so flags at [[WatermarkZ]] are the expected ~2%
    * false-positive tail — the spec pins the mean-z-near-0 sanity and
    * that both flag branches occur.
    *
    * Scale: ONE map-side pass — the per-doc greenlist fold runs inside
    * an array aggregate (no explode, no join, zero exchanges,
    * PlanSpec-pinned); md5-per-bigram is the dominant cost and is
    * embarrassingly parallel, the codec-op class.
    */
  def watermarkDetect(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("w", split(trim(col("text")), " "))
      .withColumn("g2", expr(
        "IF(size(w) >= 2, transform(sequence(1, size(w) - 1), i -> concat(w[i-1], ' ', w[i])), array())"))
      .select(
        col("doc_id"),
        size(col("g2")).cast(LongType).as("t_scored"),
        expr(
          "aggregate(g2, 0L, (acc, g) -> acc + IF(substring(md5(g), 1, 1) <= '7', 1L, 0L))")
          .as("g_hits"))
      .select(
        col("doc_id"), col("t_scored"), col("g_hits"),
        when(col("t_scored") =!= 0,
          col("g_hits").cast(DoubleType) / col("t_scored").cast(DoubleType))
          .as("green_frac"),
        when(col("t_scored") =!= 0,
          (lit(2L) * col("g_hits") - col("t_scored")).cast(DoubleType)
            / sqrt(col("t_scored").cast(DoubleType))).as("z"))
      .withColumn("flagged",
        coalesce(col("z") > lit(WatermarkZ), lit(false)))
  }

  /** Mechanism constants for [[dpCount]], public so the oracle SQL
    * interpolates THESE exact integers (the MaxBucket discipline):
    * ε = ln 2 (surfaced as the q6 literal), truncation bound B = 16, and
    * the inverse-CDF threshold ladder of the truncated two-sided
    * geometric at α = e^(−ε) = 1/2 — the ONE noise distribution whose
    * CDF is exactly rational (P(K=k) = (1/3)·2^(−|k|), CDF(k≤0) =
    * 2^(k+1)/3, CDF(k>0) = 1 − 2^(−k)/3), so quantile inversion clears
    * to pure integer comparisons: u < CDF(k) ⟺ h·3·2^B < S(k) with
    * S(k) = CDF(k)·(3·2^B)·P, all exact BIGINTs under the house hash
    * modulus P.
    */
  val DpEpsilonQ6 = 693147L
  val DpNoiseBound = 16
  val DpHashP = 1000000007L
  val DpThresholds: Seq[Long] =
    (-DpNoiseBound until DpNoiseBound).map { k =>
      if (k <= 0) (1L << (k + DpNoiseBound + 1)) * DpHashP
      else (3L * (1L << DpNoiseBound) - (1L << (DpNoiseBound - k))) * DpHashP
    }

  /** Differentially-private count release — the governance primitive a
    * data clearinghouse runs when it must publish group sizes without
    * revealing any individual's membership: per-nation customer counts
    * plus two-sided geometric noise (the discrete Laplace mechanism,
    * Ghosh-Roughgarden-Sundararajan 2009 — ε-DP for counting queries at
    * sensitivity 1), ε = ln 2, truncated at ±[[DpNoiseBound]]
    * (truncation tail mass (2/3)·2^(−16) ≈ 1e-5). True counts are NOT
    * surfaced — the release is the noisy count with its privacy
    * parameters.
    *
    * TEST-MODE NOISE SOURCE, stated loudly (the stated-stand-in discipline
    * applied to randomness): u = permKey(group)/P — a deterministic hash,
    * NOT a random draw, so this exact release is replayable by the
    * DuckDB oracle end to end (the mechanism ARITHMETIC — exact-rational
    * inverse CDF via the integer [[DpThresholds]] ladder — is what the
    * hash match proves). A production deployment swaps u for a real RNG
    * draw (one line), restoring the formal ε-DP guarantee; everything
    * else — ladder, truncation, sensitivity — ships unchanged.
    *
    * Scale: one map-side-combined count per group + an O(B) literal-array
    * fold per GROUP (never per row); output bounded by group cardinality.
    */
  def dpCount(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("true_n"))
      .withColumn("h", PipelineOps.permKey(col("c_nationkey")))
      .select(
        col("c_nationkey"),
        (col("true_n") + dpNoise).as("noisy_count"),
        lit(DpEpsilonQ6).as("epsilon_q6"),
        lit(DpNoiseBound).as("noise_bound"))
  }

  /** The geometric noise draw shared by the DP release lane: inverts the
    * exact-rational [[DpThresholds]] ladder against the test-mode uniform
    * `h` (see [[dpCount]]'s noise-source note) — an O(B) literal-array
    * fold per GROUP.
    */
  private def dpNoise: Column = {
    val x = col("h") * lit(3L * (1L << DpNoiseBound))
    val thr = array(DpThresholds.map(lit): _*)
    aggregate(thr, lit(0),
      (acc, s) => acc + when(x >= s, 1).otherwise(0)) - lit(DpNoiseBound)
  }

  /** Per-record contribution clamp for [[dpSum]]/[[dpAvg]], in exact
    * CENTS (c_acctbal through the house DECIMAL(18,2) boundary): each
    * customer contributes min(max(acctbal, 0), $5000) — the clamp IS the
    * sensitivity bound B, so one record changes the sum by at most
    * [[DpClampCents]] and noise [[DpClampCents]]·K (K the α = 1/2
    * two-sided geometric) releases the sum at ε = ln 2: a one-record
    * change moves the sum at most one noise step, bounding the
    * probability ratio by 1/α = 2.
    */
  val DpClampCents = 500000L

  /** Distinct permKey offsets so the lane's three releases (count / sum /
    * avg's count leg) draw INDEPENDENT test-mode noise — reusing one draw
    * across releases would correlate what production treats as
    * independent RNG draws.
    */
  val DpSumKeyOff = 101L
  val DpAvgCntKeyOff = 202L

  private def clampedSums(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_nationkey"),
        least(greatest(
          (col("c_acctbal").cast(DecimalType(18, 2)) * 100).cast(LongType),
          lit(0L)), lit(DpClampCents)).as("v"))
      .groupBy(col("c_nationkey")).agg(sum(col("v")).as("clamped_sum"))

  /** Differentially-private SUM release — [[dpCount]]'s next rung: total
    * (clamped) account balance per nation without revealing any single
    * customer's balance. Per-record clamping to [0, [[DpClampCents]]]
    * bounds the sensitivity (an unbounded value would need unbounded
    * noise); the release is clamped_sum + B·K with the SAME
    * exact-rational geometric ladder, so the whole mechanism — clamp,
    * ladder inversion, scaling — is replayed by the DuckDB oracle to the
    * bit. True sums are NOT surfaced. Test-mode noise source: see
    * [[dpCount]]; production swaps one line.
    *
    * Scale: one map-side-combined sum per group + the O(B) per-GROUP
    * ladder fold; output bounded by group cardinality.
    */
  def dpSum(spark: SparkSession, dir: String): DataFrame =
    clampedSums(spark, dir)
      .withColumn("h",
        PipelineOps.permKey(col("c_nationkey") + lit(DpSumKeyOff)))
      .select(
        col("c_nationkey"),
        (col("clamped_sum") + lit(DpClampCents) * dpNoise)
          .as("noisy_sum_cents"),
        lit(DpClampCents).as("clamp_cents"),
        lit(DpEpsilonQ6).as("epsilon_q6"),
        lit(DpNoiseBound).as("noise_bound"))

  /** Report-noisy-max key offset (see [[DpSumKeyOff]]). */
  val DpMaxKeyOff = 303L

  /** Report-noisy-max (Dwork-Roth §3.3) — private SELECTION, the fourth
    * rung of the DP lane: which nation has the most customers, released
    * by adding an independent geometric draw to every candidate's count
    * and reporting ONLY the argmax identity (never the scores — the
    * mechanism's entire point is that the winner's identity alone is
    * ε-DP while the noisy scores would cost budget per candidate).
    * Deterministic tiebreak (lowest key) so the release is exactly
    * replayable; same exact-rational ladder, same test-mode noise
    * contract as [[dpCount]].
    *
    * Scale: the candidate frame is group-cardinality-bounded, so the
    * argmax is a 25-row fold — the scan is the only data-sized work.
    */
  def dpNoisyMax(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("true_n"))
      .withColumn("h",
        PipelineOps.permKey(col("c_nationkey") + lit(DpMaxKeyOff)))
      .select(col("c_nationkey"), (col("true_n") + dpNoise).as("noisy"))
    scored.agg(
      min_by(col("c_nationkey"),
        struct((-col("noisy")).as("neg"), col("c_nationkey")))
        .as("winner_nationkey"),
      count(lit(1)).as("n_candidates"))
      .select(
        col("winner_nationkey"), col("n_candidates"),
        lit(DpEpsilonQ6).as("epsilon_q6"),
        lit(DpNoiseBound).as("noise_bound"))
  }

  /** Differentially-private MEAN release — the standard noisy-sum /
    * noisy-count quotient (each leg its own ε = ln 2 release on an
    * independent draw; sequential composition makes the mean 2·ln 2-DP,
    * surfaced as `epsilon_q6` = 2·[[DpEpsilonQ6]]). Both exact-integer
    * ingredients ride along (the derive-client-side discipline); the
    * quotient is ONE division of exact integers, NULL-guarded for the
    * noise-driven noisy_count ≤ 0 corner a tiny group can hit.
    */
  def dpAvg(spark: SparkSession, dir: String): DataFrame = {
    val sums = dpSum(spark, dir)
      .select(col("c_nationkey"), col("noisy_sum_cents"))
    val counts = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("true_n"))
      .withColumn("h",
        PipelineOps.permKey(col("c_nationkey") + lit(DpAvgCntKeyOff)))
      .select(col("c_nationkey"), (col("true_n") + dpNoise).as("noisy_count"))
    sums.join(counts, Seq("c_nationkey"))
      .select(
        col("c_nationkey"), col("noisy_sum_cents"), col("noisy_count"),
        when(col("noisy_count") > 0,
          col("noisy_sum_cents").cast(DoubleType)
            / (lit(100L) * col("noisy_count")).cast(DoubleType))
          .as("noisy_avg"),
        lit(2L * DpEpsilonQ6).as("epsilon_q6"),
        lit(DpNoiseBound).as("noise_bound"))
  }

  /** Repetitiveness gate for [[compressionRatio]]: docs compressing below
    * this deflate/raw ratio are flagged (repetitive text compresses
    * well). 0.45 splits the fixture ~24/76 so both branches are
    * exercised; production tunes per corpus.
    */
  val RepetitiveRatioThreshold = 0.45

  /** Compression-ratio quality signal — the cheap repetitiveness
    * heuristic the Gopher/CCNet-family cleaning stacks run beside the
    * n-gram repetition rules: deflate each document (zlib via the JDK's
    * bundled Deflater, default level) and report compressed/raw bytes.
    * Boilerplate, template spam, and degenerate repetition compress far
    * below natural prose, so a LOW ratio flags a document for the
    * repetition review that [[gopherRules]] then quantifies exactly.
    * Rows-only BY DESIGN: the compressed byte count is
    * zlib-implementation-defined (deterministic for a fixed JDK, not a
    * cross-engine constant), so no SQL oracle can replay it — the spec
    * replays the deflate straight-line and pins both flag branches.
    *
    * Scale: pure per-row map — ONE Deflater per partition, reset between
    * documents (the codec decode-slot discipline); zero exchanges, zero
    * joins; 100 TB costs one scan.
    */
  def compressionRatio(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater()
        // release the native zlib state when the task ends — GC
        // finalization is not prompt enough for off-heap buffers on a
        // long-lived executor
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => deflater.end()))
        val buf = new Array[Byte](1 << 16)
        it.map { case (id, text) =>
          val raw = text.getBytes("UTF-8")
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var out = 0L
          while (!deflater.finished()) out += deflater.deflate(buf)
          (id, raw.length.toLong, out)
        }
      }
      .toDF("doc_id", "n_raw", "n_deflate")
      .select(
        col("doc_id"), col("n_raw"), col("n_deflate"),
        when(col("n_raw") > 0,
          col("n_deflate").cast(DoubleType) / col("n_raw").cast(DoubleType))
          .as("ratio"))
      .withColumn("repetitive",
        coalesce(col("ratio") < lit(RepetitiveRatioThreshold), lit(false)))
  }

  /** Noisy-top-k key offset (see [[DpSumKeyOff]]) and release size. */
  val DpTopkKeyOff = 505L
  val DpTopkK = 3

  /** One-shot noisy top-k (the peeling mechanism's batch form, Durfee &
    * Rogers 2019) — [[dpNoisyMax]] extended to a RANKED release: every
    * candidate's count gets one independent geometric draw and the top
    * [[DpTopkK]] noisy scores release their IDENTITIES AND ORDER — never
    * the scores. Equivalent to running report-noisy-max k times with the
    * winners removed (the noise is drawn once per candidate, so the
    * ranked prefix is exactly the iterated argmax), paying k·ε by
    * sequential composition — surfaced as `epsilon_q6` = k·[[DpEpsilonQ6]].
    * Deterministic (noisy desc, lowest-key) tiebreak; same exact-rational
    * ladder and test-mode noise contract as [[dpCount]].
    *
    * Scale: the candidate frame is group-cardinality-bounded; the ranked
    * prefix is a k-row window over it.
    */
  def dpTopk(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("true_n"))
      .withColumn("h",
        PipelineOps.permKey(col("c_nationkey") + lit(DpTopkKeyOff)))
      .select(col("c_nationkey"), (col("true_n") + dpNoise).as("noisy"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("noisy").desc, col("c_nationkey"))
    val n = scored.agg(count(lit(1)).as("n_candidates"))
    scored
      .withColumn("release_rank", row_number().over(w))
      .filter(col("release_rank") <= DpTopkK)
      .crossJoin(broadcast(n))
      .select(
        col("release_rank"), col("c_nationkey").as("winner_nationkey"),
        col("n_candidates"),
        lit(DpTopkK.toLong * DpEpsilonQ6).as("epsilon_q6"),
        lit(DpNoiseBound).as("noise_bound"))
  }

  /** Candidate ladder for [[dpQuantile]]: [[DpQuantBands]] equal bands
    * over the [0, [[DpClampCents]]] clamp range, so the 33 band
    * BOUNDARIES j·[[DpQuantBandCents]] (j = 0..32) are the mechanism's
    * output candidates. 500000 = 32·15625 exactly — no rounding anywhere
    * in the ladder.
    */
  val DpQuantBands = 32
  val DpQuantBandCents: Long = DpClampCents / DpQuantBands
  /** Selection key offset (see [[DpSumKeyOff]]). */
  val DpQuantKeyOff = 404L
  /** The exponential mechanism's ε: weights are 2^u = exp(u·ε/2) with
    * Δu = 1 (rank utility), so ε = 2·ln 2 — base-2 weights are WHY the
    * whole mechanism clears to exact dyadic integers.
    */
  val DpQuantEpsilonQ6: Long = 2L * DpEpsilonQ6

  /** Differentially-private QUANTILE release (the median here) — the
    * exponential mechanism (McSherry-Talwar 2007; Smith 2011's private
    * quantile instantiation), the fifth rung of the DP lane and the first
    * that releases a VALUE chosen from a candidate set rather than a
    * noised aggregate: per nation, each boundary y_j = j·W of the
    * 32-band clamp ladder scores u_j = −|rank(y_j) − ⌈N/2⌉| (rank =
    * clamped balances in bands below j — sensitivity 1 per record), and
    * y_j is released with probability ∝ exp(ε·u_j/2) = 2^(u_j) at
    * ε = 2·ln 2. Because the weights are POWERS OF TWO, the entire
    * sampler is exact integer arithmetic: weights 2^(u_j − u_max)
    * truncated at 2^(−[[DpNoiseBound]]) (the dpCount tail-mass
    * discipline) scale to BIGINTs in [1, 2^16], the inverse CDF is the
    * same ladder-count fold as [[dpNoise]], and the DuckDB oracle
    * replays clamp → band counts → ranks → utilities → dyadic weights →
    * selection to the bit. True ranks and counts are NOT surfaced.
    * Test-mode noise source: see [[dpCount]]; production swaps the
    * uniform for a real RNG draw, everything else ships unchanged.
    *
    * Scale: ONE map-side-combined scan (32 conditional counts per
    * group); ranks/weights/selection are O(bands²) array folds per
    * GROUP — output and post-scan work bounded by group cardinality,
    * exactly like the rest of the lane.
    */
  def dpQuantile(spark: SparkSession, dir: String): DataFrame = {
    val nB = DpQuantBands
    val w = DpQuantBandCents
    val b = DpNoiseBound
    val bandCounts = (0 until nB).map(i =>
      sum(when(col("band") === i, 1L).otherwise(0L)).as(s"c$i"))
    Tables.customer(spark, dir)
      .select(
        col("c_nationkey"),
        least(greatest(
          (col("c_acctbal").cast(DecimalType(18, 2)) * 100).cast(LongType),
          lit(0L)), lit(DpClampCents)).as("v"))
      .withColumn("band",
        least(expr(s"v DIV $w"), lit(nB - 1L)).cast(IntegerType))
      .groupBy(col("c_nationkey"))
      .agg(bandCounts.head, bandCounts.tail: _*)
      .withColumn("cnts", array((0 until nB).map(i => col(s"c$i")): _*))
      .withColumn("h",
        PipelineOps.permKey(col("c_nationkey") + lit(DpQuantKeyOff)))
      // rank at boundary j = clamped values in bands 0..j−1 (j = 0..32)
      .withColumn("ranks", expr(
        s"transform(sequence(0, $nB), " +
          "j -> aggregate(slice(cnts, 1, j), 0L, (a, x) -> a + x))"))
      .withColumn("t", expr(s"(element_at(ranks, ${nB + 1}) + 1L) DIV 2"))
      .withColumn("umax", expr("array_max(transform(ranks, r -> -abs(r - t)))"))
      // dyadic weights 2^(u − umax) truncated at 2^(−b), scaled by 2^b
      .withColumn("ws", expr(
        s"transform(ranks, r -> shiftleft(1L, " +
          s"CAST(greatest(-abs(r - t) - umax + $b, 0L) AS INT)))"))
      .withColumn("cums", expr(
        s"transform(sequence(1, ${nB + 1}), " +
          "j -> aggregate(slice(ws, 1, j), 0L, (a, x) -> a + x))"))
      // inverse CDF: u < cum_j/W ⟺ h·W < cum_j·P (the dpNoise fold)
      .withColumn("jstar", expr(
        s"aggregate(cums, 0L, (a, c) -> a + IF(" +
          s"h * element_at(cums, ${nB + 1}) >= c * ${DpHashP}L, 1L, 0L))"))
      .select(
        col("c_nationkey"),
        (col("jstar") * lit(w)).as("noisy_median_cents"),
        lit(nB + 1).as("n_candidates"),
        lit(DpClampCents).as("clamp_cents"),
        lit(DpQuantEpsilonQ6).as("epsilon_q6"))
  }

  /** Inter-annotator agreement — Fleiss' kappa (Fleiss 1971) over three
    * deterministic heuristic labelers, the annotation-QC statistic every
    * labeling pipeline (RLHF preference raters, quality annotators)
    * publishes before the labels are trusted: observed agreement among n
    * raters corrected for the agreement their marginal label rates would
    * produce by chance. The raters here are three rule labelers in the
    * gopher_rules family (char-length tertiles, token-count tertiles,
    * distinct-token-ratio bands — the third deliberately measures a
    * different axis so real disagreement exists), each mapping a doc to
    * a category in {0,1,2}; a production deployment swaps in real
    * annotator columns, the statistic is unchanged.
    *
    * Exactness: with 3 raters, Σ_j n_ij² = 3 + 2·(# agreeing pairs) per
    * item, so the whole computation reduces to integer counts; clearing
    * denominators gives κ = (3N(S−3N) − 2ΣT_j²) / (18N² − 2ΣT_j²) — a
    * ratio of exact integers with ONE boundary division (the chi_square
    * discipline). Products run in DECIMAL(38,0) and the int64 boundary
    * cast is guarded (the aqp_estimate asymmetric-overflow rule);
    * 18N² < 2^63 holds to N ≈ 7·10⁸ docs — a 100 TB census would
    * surface the decimal columns unchanged. κ's final division is
    * BIGINT→DOUBLE on both engines (exact below 2^53), correctly
    * rounded once.
    *
    * Scale: one corpus pass, map-side partial aggregation into a 1-row
    * summary. No joins, no shuffle wider than the aggregation.
    */
  /** The three rule raters' category cuts — public so the oracle SQL
    * interpolates THESE values (the MaxBucket discipline): char-length
    * tertiles, token-count tertiles, distinct-token-ratio percent bands
    * (cross-multiplied, never a float ratio).
    */
  val FleissCharCuts: (Long, Long) = (216L, 380L)
  val FleissTokCuts: (Long, Long) = (39L, 69L)
  val FleissRatioPctCuts: (Long, Long) = (40L, 55L)

  def fleissKappa(spark: SparkSession, dir: String): DataFrame = {
    val rated = Tables.documents(spark, dir)
      .select(col("n_chars"),
        size(split(trim(col("text")), " ")).cast(LongType).as("n_tok"),
        size(array_distinct(split(trim(col("text")), " ")))
          .cast(LongType).as("n_dis"))
      .select(
        when(col("n_chars") < FleissCharCuts._1, 0L)
          .when(col("n_chars") < FleissCharCuts._2, 1L)
          .otherwise(2L).as("ra"),
        when(col("n_tok") < FleissTokCuts._1, 0L)
          .when(col("n_tok") < FleissTokCuts._2, 1L)
          .otherwise(2L).as("rb"),
        when(col("n_dis") * 100 < col("n_tok") * FleissRatioPctCuts._1, 0L)
          .when(col("n_dis") * 100 < col("n_tok") * FleissRatioPctCuts._2, 1L)
          .otherwise(2L).as("rc"))
    def catCount(j: Long): Column =
      (col("ra") === j).cast(LongType) + (col("rb") === j).cast(LongType) +
        (col("rc") === j).cast(LongType)
    val agg = rated
      .select(
        (lit(3L) + lit(2L) *
          ((col("ra") === col("rb")).cast(LongType) +
            (col("ra") === col("rc")).cast(LongType) +
            (col("rb") === col("rc")).cast(LongType))).as("s_i"),
        catCount(0L).as("c0"), catCount(1L).as("c1"), catCount(2L).as("c2"))
      .agg(count(lit(1)).as("n"), sum(col("s_i")).as("s_sum"),
        sum(col("c0")).as("t0"), sum(col("c1")).as("t1"),
        sum(col("c2")).as("t2"))
    def d19(c: Column) = c.cast(DecimalType(19, 0))
    val t2sum = d19(col("t0")) * col("t0") + d19(col("t1")) * col("t1") +
      d19(col("t2")) * col("t2")
    val numDec = lit(3) * d19(col("n")) * (col("s_sum") - lit(3) * col("n")) -
      lit(2) * col("t2s_dec")
    val denDec = lit(18) * d19(col("n")) * col("n") - lit(2) * col("t2s_dec")
    val boundGuard = assert_true(
      abs(col("num_dec")) <= lit(Long.MaxValue) &&
        abs(col("den_dec")) <= lit(Long.MaxValue),
      lit("fleiss_kappa: cleared numerator exceeds int64 — surface decimals"))
    agg
      .withColumn("t2s_dec", t2sum)
      .withColumn("num_dec", numDec)
      .withColumn("den_dec", denDec)
      // the guard is a FILTER stage, not a when() riding one output
      // column: a projection selecting only the sibling (kappa_den)
      // would prune a column-borne assert away and the DECIMAL→BIGINT
      // cast would overflow silently — a Filter survives any projection
      // (PlanSpec pins it through a pruned select)
      .filter(boundGuard.isNull)
      .withColumn("kappa_num", col("num_dec").cast(LongType))
      .withColumn("kappa_den", col("den_dec").cast(LongType))
      .select(col("n"), col("s_sum"), col("t0"), col("t1"), col("t2"),
        col("kappa_num"), col("kappa_den"),
        when(col("kappa_den") =!= 0,
          col("kappa_num").cast(DoubleType) / col("kappa_den").cast(DoubleType))
          .as("kappa"))
  }
}
