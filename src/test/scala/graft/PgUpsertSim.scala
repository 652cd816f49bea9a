package graft

/** Executable PostgreSQL-subset interpreter for the statement family
  * [[graft.streaming.JdbcUpsertSink.Dialect.Postgres]] emits (reference:
  * processor.py:145-164). The sandbox ships no PostgreSQL and no H2 jar,
  * so this is the strongest available EXECUTION check for the native
  * dialect: a strict tokenizer + recursive-descent parser over the
  * generated SQL TEXT (exact clause order, balanced quotes and parens,
  * no trailing commas, every EXCLUDED reference well-formed — the
  * classes of defect PG's parser would reject fail here as exceptions),
  * followed by a faithful ON CONFLICT semantic walk over an in-memory
  * table:
  *
  *  - `DO UPDATE` applies the SET list from the EXCLUDED (incoming) row;
  *  - `DO NOTHING` skips conflicting rows;
  *  - a single INSERT whose rows affect the same target row twice raises
  *    PG's "cannot affect row a second time" for `DO UPDATE` — but NOT
  *    for `DO NOTHING` (PG skips the second row: it conflicts with the
  *    first, just-inserted one), matching the real engine's asymmetry;
  *  - the optional one-row-per-key dedup subquery (`row_number() OVER
  *    (PARTITION BY keys ORDER BY non-keys) … WHERE graft_rn = 1`) is
  *    parsed and executed with real window semantics, so the spec can
  *    show it is LOAD-BEARING: the same staging rows through a naive
  *    single-level INSERT raise the affect-twice error.
  *
  * Values are restricted to `Comparable` types (String / BigDecimal /
  * Long / Timestamp — everything the sink stages), compared with their
  * natural order like the SQL ORDER BY would.
  */
object PgUpsertSim {

  // ---------------------------------------------------------------- tokens
  sealed trait Tok
  /** Bare word (keyword, unquoted table/alias name) — original case kept,
    * matched case-insensitively like PG folds unquoted identifiers.
    */
  final case class Word(s: String) extends Tok
  /** `"quoted identifier"` — case-exact, never folded. */
  final case class Id(s: String) extends Tok
  final case class Sym(s: String) extends Tok
  final case class Num(n: Long) extends Tok

  def tokenize(sql: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < sql.length) {
      val c = sql(i)
      if (c.isWhitespace) i += 1
      else if (c == '"') {
        val j = sql.indexOf('"', i + 1)
        require(j > 0, s"unterminated quoted identifier at offset $i")
        require(j > i + 1, s"empty quoted identifier at offset $i")
        out += Id(sql.substring(i + 1, j)); i = j + 1
      } else if (c.isLetter || c == '_') {
        val j0 = i
        while (i < sql.length && (sql(i).isLetterOrDigit || sql(i) == '_')) i += 1
        out += Word(sql.substring(j0, i))
      } else if (c.isDigit) {
        val j0 = i
        while (i < sql.length && sql(i).isDigit) i += 1
        out += Num(sql.substring(j0, i).toLong)
      } else if ("(),=.*".indexOf(c) >= 0) { out += Sym(c.toString); i += 1 }
      else sys.error(s"unexpected character '$c' at offset $i")
    }
    out.result()
  }

  // ---------------------------------------------------------------- parser
  /** Parsed shape of the dialect's INSERT statement. `dedup` carries the
    * subquery's (partition keys, order columns) when present; absent for
    * the naive single-level form.
    */
  final case class Upsert(
      table: String,
      cols: Seq[String],
      staging: String,
      dedup: Option[(Seq[String], Seq[String])],
      conflictKeys: Seq[String],
      updateSet: Option[Seq[(String, String)]])

  private final class P(ts: Vector[Tok]) {
    private var i = 0
    def done: Boolean = i == ts.length
    def peek: Tok = { require(i < ts.length, "unexpected end of statement"); ts(i) }
    def next(): Tok = { val t = peek; i += 1; t }
    def word(s: String): Unit = next() match {
      case Word(w) if w.equalsIgnoreCase(s) => ()
      case other => sys.error(s"expected $s, got $other")
    }
    def peekWord(s: String): Boolean = !done && (peek match {
      case Word(w) => w.equalsIgnoreCase(s)
      case _ => false
    })
    def sym(s: String): Unit = next() match {
      case Sym(x) if x == s => ()
      case other => sys.error(s"expected '$s', got $other")
    }
    def ident(): String = next() match {
      case Id(s) => s
      case other => sys.error(s"expected quoted identifier, got $other")
    }
    def bare(): String = next() match {
      case Word(s) => s
      case other => sys.error(s"expected bare identifier, got $other")
    }
    def num(): Long = next() match {
      case Num(n) => n
      case other => sys.error(s"expected number, got $other")
    }
    /** Comma-separated list; rejects trailing commas by construction. */
    def list[A](elem: () => A): Seq[A] = {
      val b = Seq.newBuilder[A]
      b += elem()
      while (!done && peek == Sym(",")) { next(); b += elem() }
      b.result()
    }
  }

  def parse(sql: String): Upsert = {
    val p = new P(tokenize(sql))
    p.word("INSERT"); p.word("INTO")
    val table = p.bare()
    p.sym("("); val cols = p.list(() => p.ident()); p.sym(")")
    p.word("SELECT")
    val selectCols = p.list(() => p.ident())
    require(selectCols == cols,
      s"select list $selectCols must match insert columns $cols")
    p.word("FROM")
    // either the dedup subquery or the bare staging table
    val (staging, dedup) =
      if (p.peek == Sym("(")) {
        p.sym("("); p.word("SELECT")
        val sAlias = p.bare(); p.sym("."); p.sym("*"); p.sym(",")
        p.word("row_number"); p.sym("("); p.sym(")"); p.word("OVER"); p.sym("(")
        p.word("PARTITION"); p.word("BY")
        def qualified(): String = {
          val a = p.bare()
          require(a.equalsIgnoreCase(sAlias), s"window ref $a must use alias $sAlias")
          p.sym("."); p.ident()
        }
        val partKeys = p.list(qualified _)
        val orderCols =
          if (p.peekWord("ORDER")) { p.word("ORDER"); p.word("BY"); p.list(qualified _) }
          else Seq.empty
        p.sym(")")
        p.word("AS"); val rn = p.bare()
        p.word("FROM"); val stg = p.bare()
        val sAlias2 = p.bare()
        require(sAlias2.equalsIgnoreCase(sAlias), "subquery alias mismatch")
        p.sym(")")
        p.bare() // outer derived-table alias
        p.word("WHERE")
        val w = p.bare()
        require(w.equalsIgnoreCase(rn), s"filter $w must reference $rn")
        p.sym("=")
        require(p.num() == 1L, "dedup filter must keep rank 1")
        (stg, Some((partKeys, orderCols)))
      } else {
        val stg = p.bare()
        if (!p.peekWord("ON")) p.bare() // optional alias
        (stg, None)
      }
    p.word("ON"); p.word("CONFLICT")
    p.sym("("); val conflictKeys = p.list(() => p.ident()); p.sym(")")
    p.word("DO")
    val updateSet = p.next() match {
      case Word(w) if w.equalsIgnoreCase("NOTHING") => None
      case Word(w) if w.equalsIgnoreCase("UPDATE") =>
        p.word("SET")
        Some(p.list { () =>
          val c = p.ident(); p.sym("=")
          p.word("EXCLUDED"); p.sym("."); val e = p.ident()
          (c, e)
        })
      case other => sys.error(s"expected NOTHING or UPDATE, got $other")
    }
    require(p.done, "trailing tokens after conflict action")
    // PG-level semantic validation (what the planner would enforce)
    require(conflictKeys.forall(cols.contains),
      "conflict keys must be inserted columns")
    updateSet.foreach { set =>
      set.foreach { case (c, e) =>
        require(cols.contains(c), s"SET column $c not in insert list")
        require(c == e, s"dialect only assigns EXCLUDED of the same column ($c = EXCLUDED.$e)")
        require(!conflictKeys.contains(c), s"SET must not touch arbiter key $c")
      }
      require(set.map(_._1).distinct == set.map(_._1),
        "duplicate column in SET list")
    }
    dedup.foreach { case (pk, _) =>
      require(pk == conflictKeys,
        s"dedup partition keys $pk must equal the conflict arbiter $conflictKeys")
    }
    Upsert(table, cols, staging, dedup, conflictKeys, updateSet)
  }

  // -------------------------------------------------------------- executor
  type Row = Map[String, Any]

  private val anyOrd: Ordering[Any] =
    (a: Any, b: Any) => a.asInstanceOf[Comparable[Any]].compareTo(b)
  private val rowKeyOrd: Ordering[Seq[Any]] = (x: Seq[Any], y: Seq[Any]) =>
    x.zip(y).iterator.map { case (a, b) => anyOrd.compare(a, b) }
      .find(_ != 0).getOrElse(0)

  /** Execute the 2-statement merge (INSERT…ON CONFLICT, DROP staging)
    * against `target`, keyed by the arbiter tuple. Mutates `target` like
    * the statement would; raises like PG on a row affected twice.
    */
  def execute(stmts: Seq[String], staging: Seq[Row],
              target: scala.collection.mutable.LinkedHashMap[Seq[Any], Row]): Unit = {
    require(stmts.length == 2, s"expected INSERT + DROP, got $stmts")
    val u = parse(stmts.head)
    val p2 = new P(tokenize(stmts(1)))
    p2.word("DROP"); p2.word("TABLE")
    require(p2.bare().equalsIgnoreCase(u.staging),
      "DROP must remove the staged table the INSERT read")
    require(p2.done, "trailing tokens after DROP")

    val incoming: Seq[Row] = u.dedup match {
      case Some((partKeys, orderCols)) =>
        // real window semantics: rank within each arbiter-key group by the
        // order columns, keep rank 1 (the smallest non-key tuple)
        staging.groupBy(r => partKeys.map(r)).toSeq
          .sortBy(_._1)(rowKeyOrd)
          .map { case (_, g) => g.minBy(r => orderCols.map(r))(rowKeyOrd) }
      case None => staging
    }
    val affected = scala.collection.mutable.Set[Seq[Any]]()
    incoming.foreach { r =>
      val k = u.conflictKeys.map(r)
      if (!target.contains(k)) {
        target(k) = u.cols.map(c => c -> r(c)).toMap
        affected += k
      } else u.updateSet match {
        case None => () // DO NOTHING skips — even a same-statement duplicate
        case Some(set) =>
          if (!affected.add(k))
            sys.error("ON CONFLICT DO UPDATE command cannot affect row a second time")
          target(k) = target(k) ++ set.map { case (c, e) => c -> r(e) }
      }
    }
  }
}
