package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Tables

/** Scalar/parse layer — batch analogs of the reference's projection chain
  * (reference: spark_processor/processor.py:65-75 — CAST value, from_json,
  * flatten, decimal casts, epoch-ms→timestamp, derived multiply).
  *
  * All expressions are Spark built-ins so they stay inside whole-stage
  * codegen and their input columns prune down to the parquet scan.
  */
object ParseOps {

  /** P2/P3/P10: parse the JSON `props` payload of events.
    * The reference parses the Kafka JSON value against a declared schema
    * (processor.py:66-67); here the JSON column is `events.props`.
    * `get_json_object` is PERMISSIVE like `from_json`: malformed → NULL.
    */
  def jsonParse(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        col("event_type"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))

  /** P4: decimal-string → DecimalType(20,8), the reference's price/quantity
    * cast (processor.py:71-72). Non-numeric input → NULL (non-ANSI). The
    * DecimalType(20,8) cast carries exact semantics internally; the output
    * boundary is DOUBLE (SURVEY §7.4: the two engines' decimal wire
    * representations hash differently even when values are equal).
    */
  def decimalCast(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(DecimalType(20, 8))
          .cast(DoubleType).as("k_dec"))

  /** P5: epoch-ms ↔ timestamp. The reference does
    * `(trade_time / 1000).cast("timestamp")` (processor.py:73); we use the
    * exact integer form `unix_millis`/`timestamp_millis` (SURVEY §1.3).
    */
  def epochToTs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        unix_millis(col("ts")).as("epoch_ms"),
        timestamp_millis(unix_millis(col("ts"))).as("ts_ms"))

  /** P9: event-type filter — the producer keeps only `e == "trade"` messages
    * (reference: producer/producer.py:50); in-engine for us so it pushes
    * down to the parquet scan.
    */
  def filterEventType(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  /** P6: derived multiply — `trade_value = price * quantity`
    * (processor.py:74). Decimal-exact product, surfaced as DOUBLE so the
    * DuckDB oracle hashes bit-identically.
    */
  def derivedMul(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        (col("value").cast(DecimalType(18, 2)) *
          get_json_object(col("props"), "$.k").cast(DecimalType(18, 0)))
          .cast(DoubleType).as("trade_value"))

  /** String functions over part/customer (SURVEY §2.5 string_funcs). */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_name").like("%1%"))
      .select(
        col("c_custkey"),
        upper(col("c_mktsegment")).as("seg_upper"),
        lower(col("c_name")).as("name_lower"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        length(col("c_name")).as("name_len"),
        concat_ws("-", col("c_mktsegment"), col("c_name")).as("seg_name"),
        trim(col("c_name")).as("name_trim"),
        replace(col("c_name"), lit("Customer"), lit("Cust")).as("name_repl"))

  /** Date functions over orders (SURVEY §2.5 date_funcs). */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        dayofmonth(col("o_orderdate")).as("o_day"),
        quarter(col("o_orderdate")).as("o_quarter"),
        date_trunc("month", col("o_orderdate")).as("o_month_start"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast(DateType))
          .as("days_since_95"))

  /** Math functions over lineitem (SURVEY §2.5 math_funcs).
    * Restricted to operations whose numeric semantics are bit-identical in
    * Spark and DuckDB: abs / floor / ceil / pow-of-int / IEEE-exact sqrt,
    * and round applied to DECIMAL (double-round half-cases differ between
    * BigDecimal HALF_UP and C rounding, decimal-round does not).
    */
  def mathFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_linenumber") === 1)
      .select(
        col("l_orderkey"),
        abs(col("l_extendedprice") * -1).as("abs_price"),
        floor(col("l_extendedprice")).as("floor_price"),
        ceil(col("l_extendedprice")).as("ceil_price"),
        round(col("l_extendedprice").cast(DecimalType(18, 2)), 1)
          .cast(DoubleType).as("round_price"),
        sqrt(col("l_extendedprice")).as("sqrt_price"),
        pow(col("l_quantity"), 2).as("qty_sq"))

  /** JSON extraction variants (SURVEY §2.5 json_extract). */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .filter(col("k") > 50)

  /** XML scalar-function roundtrip (Spark 4 in-core `to_xml`/`from_xml`,
    * the P-family twin of [[jsonExtract]] for the other enterprise wire
    * format): each event serialized to an XML fragment, parsed back with
    * an explicit schema, fields re-projected. Long/double element text
    * round-trips exactly (shortest-form printing), so the oracle is the
    * identity projection — proving serialize∘parse is lossless is the
    * point.
    *
    * Deliberately `xpath_*`-FREE on the hot path: schema'd `from_xml`
    * parses via StAX at ~8 µs/row, while `xpath_string` builds a DOM per
    * evaluation at ~45 µs/row (measured at sf0.1) — 5× the cost for the
    * same field. xpath is the schema-less probing escape hatch, covered
    * by spec (RobustOpsSpec) with the agreement assertion, never the
    * extraction path a 100 TB scan should take.
    */
  def xmlFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        to_xml(struct(col("event_id"), col("event_type"), col("value")))
          .as("frag"))
      .select(
        col("event_id"),
        from_xml(col("frag"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "event_id BIGINT, event_type STRING, value DOUBLE"),
          java.util.Collections.emptyMap[String, String]()).as("x"))
      .select(
        col("event_id"),
        col("x.event_type").as("rt_type"),
        col("x.value").as("rt_value"))
      .filter(col("rt_value") > 50.0)

  /** Bitwise function family over integer keys. */
  def bitwiseFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        (col("event_id").bitwiseAND(lit(255L))).as("ev_and"),
        (col("event_id").bitwiseOR(lit(16L))).as("ev_or"),
        (col("event_id").bitwiseXOR(col("user_id"))).as("ev_xor"),
        shiftleft(col("event_id"), 2).as("ev_shl"),
        shiftright(col("event_id"), 1).as("ev_shr"),
        bit_count(col("event_id")).as("ev_bits"))

  /** Date arithmetic family: day offsets, calendar-month offsets with
    * end-of-month clamping (both engines clamp Jan 31 + 1 month to the
    * last Feb day), month-end, and quarter truncation. DATE values surface
    * as 'yyyy-MM-dd' strings: engines disagree on the in-memory date
    * representation at the comparator boundary (date32 object vs
    * datetime64), the rendered form is unambiguous.
    */
  def dateArith(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        date_add(to_date(col("o_orderdate")), 30).cast(StringType).as("due_30d"),
        add_months(to_date(col("o_orderdate")), 2).cast(StringType).as("due_2mo"),
        last_day(to_date(col("o_orderdate"))).cast(StringType).as("month_end"),
        date_trunc("quarter", col("o_orderdate")).cast(DateType)
          .cast(StringType).as("quarter_start"))

  /** Date formatting family: pattern-rendered strings + epoch round-trips.
    * (Spark uses java patterns, oracle engines strftime — semantically
    * aligned patterns chosen so both render identically.)
    */
  def dateFormatFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("full_ts"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        to_date(col("o_orderdate")).cast("string").as("date_str"))

  /** Error-safe function family (`try_divide` / `try_cast`): malformed or
    * degenerate inputs produce NULL instead of failing the job — at
    * corpus scale a single dirty row must never kill a 10-hour pipeline,
    * and NULL-on-error keeps the behavior identical under ANSI and
    * non-ANSI modes. try_divide guards the zero-denominator case the
    * engine otherwise handles with explicit `when` guards; try_cast
    * exercises a mix of clean and unparseable strings.
    */
  def tryFuncs(spark: SparkSession, dir: String): DataFrame =
    // balanced: four try_* casts/divides per row (props is a JSON string —
    // try_cast to double walks it) fused into the ONE-split events scan:
    // profiled 1.4 s on a single task at sf0.1 (r17, guide §2.5)
    Tables.balanced(Tables.events(spark, dir))
      .select(
        col("event_id"),
        expr("try_divide(value, cast(event_id % 3 as double))").as("per_unit"),
        expr("try_cast(props as double)").as("props_num"),
        expr("try_cast(substr(event_type, 1, 1) as int)").as("type_num"),
        expr("try_cast(cast(event_id as string) as bigint)").as("id_roundtrip"))

  /** Higher-order array function family (transform / filter / aggregate /
    * exists) over each document's token-length array — the declarative
    * array algebra that stays inside codegen where a UDF would not.
    * Integer folds only (sums/counts are exact on any engine; a double
    * fold would be evaluation-order-sensitive).
    */
  def arrayHof(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("lens", expr("transform(split(trim(text), ' '), x -> length(x))"))
      .select(
        col("doc_id"),
        size(col("lens")).as("n_tokens"),
        expr("aggregate(lens, 0L, (acc, x) -> acc + x)").as("sum_len"),
        expr("size(filter(lens, x -> x >= 6))").as("n_long"),
        expr("exists(lens, x -> x = 8)").as("has_len8"),
        expr("aggregate(transform(lens, x -> cast(x as bigint) * x), 0L, (acc, x) -> acc + x)")
          .as("sq_sum"))

  /** Semi-structured access through Spark 4's VARIANT type: `parse_json`
    * builds the binary variant ONCE per row and typed paths come out via
    * `variant_get` — the open-schema ingestion path (vs [[jsonExtract]]'s
    * per-path string re-parse, which re-reads the JSON text for every
    * extracted field). Variant is a binary format, so only typed leaves
    * cross the output boundary (the oracle reads the same paths with its
    * native JSON accessors).
    */
  def variantExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("v", expr("parse_json(props)"))
      .select(
        col("event_id"),
        expr("variant_get(v, '$.k', 'long')").as("k_long"),
        expr("variant_get(v, '$.k', 'string')").as("k_str"),
        expr("schema_of_variant(v)").as("v_schema"))
}
