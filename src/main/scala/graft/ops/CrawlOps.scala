package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Tables

/** Crawl-layer preparation — the web-facing front of a pretraining
  * pipeline (the CCNet shape, public knowledge): URL canonicalization
  * and per-domain corpus accounting. The fixture corpus carries no url
  * column, so a deterministic messy URL is SYNTHESIZED per document from
  * (doc_id, source) — scheme/host case, www prefix, default and
  * non-default ports, trailing slash, tracking parameters, fragments all
  * derived from doc_id residues so every normalization rule fires on
  * every corpus. Both the synthesis and the normalization are pure
  * deterministic string expressions (no RNG, no network), so both ops
  * are fully oracle-checked with the identical rules restated in SQL.
  *
  * Scale shape: url_normalize is a pure map (zero exchanges — the
  * train_test_split discipline); domain_stats is one partial-aggregated
  * groupBy on the domain key plus a broadcast 1-row total for the share
  * division.
  */
object CrawlOps {

  /** The synthesized raw URL — every rule's trigger present:
    * upper/lower scheme and host by id parity, `WWW.` prefix every 3rd
    * doc, `:443`/`:80` default ports aligned with their scheme (id%4 =
    * 0/1 — both even/odd-consistent with the scheme choice), `:8080`
    * surviving normalization, trailing slash every 5th doc, utm_* +
    * gclid tracking params around the real `id`/`lang` params, and a
    * fragment every 6th doc.
    */
  private[ops] def rawUrl: Column = {
    val id = col("doc_id")
    val scheme = when(id % 2 === 0, lit("HTTPS")).otherwise(lit("http"))
    val www = when(id % 3 === 0, lit("WWW.")).otherwise(lit(""))
    val host = when(id % 2 === 0, upper(col("source"))).otherwise(col("source"))
    val tld = element_at(
      array(lit("com"), lit("org"), lit("net")), (length(col("source")) % 3) + 1)
    val port = when(id % 4 === 0, lit(":443"))
      .when(id % 4 === 1, lit(":80"))
      .when(id % 4 === 2, lit(":8080"))
      .otherwise(lit(""))
    val path = concat(lit("/Docs/"), id.cast(StringType),
      when(id % 5 === 0, lit("/")).otherwise(lit("")))
    val query = concat(lit("?id="), id.cast(StringType),
      lit("&utm_source=feed"),
      when(id % 2 === 0, lit("&lang=en")).otherwise(lit("")),
      lit("&utm_campaign=c"),
      when(id % 7 === 0, lit("&gclid=g1")).otherwise(lit("")))
    val frag = when(id % 6 === 0, lit("#sec2")).otherwise(lit(""))
    concat(scheme, lit("://"), www, host, lit("."), tld, port, path, query, frag)
  }

  /** URL canonicalization (crawl-dedup preprocessing): lowercase scheme
    * and host, strip a leading `www.`, drop the scheme's default port
    * (`:80` http / `:443` https) but keep non-default ports, strip the
    * path's trailing slash (path case is PRESERVED — paths are
    * case-sensitive), drop `utm_*`/`gclid`/`fbclid`/`ref` tracking
    * parameters keeping the survivors in original order, and drop the
    * fragment. Emits the kept/dropped parameter counts and the
    * registered-domain key `domain_stats` aggregates on. Pure map —
    * regex parsing via the function API (patterns never transit the SQL
    * parser's backslash-eating path).
    */
  def urlNormalize(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), rawUrl.as("url"))
    val scheme = lower(regexp_extract(col("url"), "^([A-Za-z]+)://", 1))
    val rest = regexp_replace(col("url"), "^[A-Za-z]+://", "")
    val hostport = regexp_extract(rest, "^([^/?#]*)", 1)
    val rawHost = lower(regexp_extract(hostport, "^([^:]*)", 1))
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val path = regexp_extract(rest, "^[^/?#]*([^?#]*)", 1)
    val query = regexp_extract(col("url"), "\\?([^#]*)", 1)
    val host = regexp_replace(rawHost, "^www\\.", "")
    val keepPort = (port =!= "") &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val npath = regexp_replace(path, "/$", "")
    val params = split(query, "&")
    val tracking = (p: Column) =>
      p.startsWith("utm_") || p.startsWith("gclid=") ||
        p.startsWith("fbclid=") || p.startsWith("ref=")
    val kept = filter(params, p => !tracking(p))
    base.select(
      col("doc_id"),
      col("url"),
      concat(scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        npath,
        when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
          .otherwise(lit(""))).as("norm_url"),
      host.as("domain"),
      size(kept).as("n_params_kept"),
      (size(params) - size(kept)).as("n_params_dropped"))
  }

  /** Deterministic HTML page for a document — the fixture corpus carries
    * no markup, so the crawl lane synthesizes a page per doc the way the
    * URL lane synthesizes URLs: title head, nav boilerplate, the text
    * split into 20-word `<p>` paragraphs, an ad block every 3rd doc, a
    * link list whose targets rotate deterministically across the other
    * domains, and a footer. Every downstream op EXTRACTS from this
    * string with regexes (never re-derives the synthesis), so the
    * extraction logic is real even though the page is synthetic.
    */
  private[ops] def htmlDoc: Column = {
    val id = col("doc_id")
    val paras = concat_ws("", expr(
      "transform(sequence(0, int((size(split(trim(text), ' ')) + 19) div 20) - 1)," +
        " i -> concat('<p>', concat_ws(' ', slice(split(trim(text), ' '), i * 20 + 1, 20)), '</p>'))"))
    // link targets rotate across the other domains under the SAME
    // source→tld rule the rest of the crawl lane uses (srcK.org for
    // K<10, srcK.net above — len(srcK) % 3 of the domain synthesis)
    val links = concat_ws("", expr(
      """transform(sequence(0, int(doc_id % 3)),
        |  i -> concat('<li><a href="https://src', (doc_id * 7 + i) % 20, '.',
        |              if((doc_id * 7 + i) % 20 < 10, 'org', 'net'),
        |              '/Docs/', doc_id * 31 + i, '">ref</a></li>'))"""
        .stripMargin))
    concat(
      lit("<html><head><title>Doc "), id.cast(StringType),
      lit("</title></head><body>"),
      lit("""<nav><a href="/home">home</a> <a href="/about">about</a></nav>"""),
      when(id % 3 === 0,
        lit("""<div class="ad">buy now limited offer</div>""")).otherwise(lit("")),
      lit("""<div class="content">"""), paras, lit("</div>"),
      lit("<ul>"), links, lit("</ul>"),
      lit("<footer>copyright 2024 example</footer></body></html>"))
  }

  /** Main-content extraction from HTML (the trafilatura/jusText step of
    * a crawl pipeline, reduced to its deterministic core): `<p>`
    * paragraph contents are the content; everything else that renders as
    * text (nav, ads, link anchors, footer) is boilerplate. Tag stripping
    * and paragraph extraction are REAL regex passes over the page string
    * — patterns contain no escapes, so Spark/RE2 parity is structural.
    * Output: paragraph count, content vs total rendered chars, and the
    * content ratio (the quality signal crawl filters threshold on).
    * Pure map, zero exchanges.
    */
  def htmlExtract(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), htmlDoc.as("html"))
    val paras = regexp_extract_all(col("html"), lit("<p>([^<]*)</p>"), lit(1))
    val rendered = trim(regexp_replace(
      regexp_replace(col("html"), lit("<[^>]*>"), lit(" ")), lit(" +"), lit(" ")))
    base.select(
      col("doc_id"),
      size(paras).as("n_paragraphs"),
      length(concat_ws(" ", paras)).as("content_chars"),
      length(rendered).as("total_chars"),
      (length(concat_ws(" ", paras)).cast(DoubleType) / length(rendered))
        .as("content_ratio"))
  }

  /** Domain-level link graph from the pages' actual `<a href>` markup —
    * the web-graph edge primitive (host-level, the granularity crawl
    * schedulers and spam graphs use): hrefs are EXTRACTED from the HTML
    * by regex, reduced to their host, and aggregated to
    * (src_domain, dst_domain, n_links). Explode fan-out is the per-page
    * link count (bounded ≤ 3 here, page-bounded in production); the one
    * shuffle is the partial-aggregated domain-pair groupBy.
    */
  def linkGraph(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), htmlDoc.as("html"))
    val tld = element_at(
      array(lit("com"), lit("org"), lit("net")), (length(col("source")) % 3) + 1)
    base
      .select(
        concat(col("source"), lit("."), tld).as("src_domain"),
        explode(regexp_extract_all(col("html"),
          lit("href=\"https://([^/\"]*)/"), lit(1))).as("dst_domain"))
      .groupBy(col("src_domain"), col("dst_domain"))
      .agg(count(lit(1)).as("n_links"))
  }

  /** Per-registered-domain corpus accounting — the crawl dashboard's
    * first table: document and token counts plus each domain's share of
    * the token budget (the source_mix shape keyed by the normalized
    * domain). The 1-row token total broadcasts; everything else is one
    * partial-aggregated groupBy on the domain key.
    */
  def domainStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), " ")).cast(LongType).as("n_toks"))
      .withColumn("domain",
        concat(col("source"), lit("."), element_at(
          array(lit("com"), lit("org"), lit("net")),
          (length(col("source")) % 3) + 1)))
    val perDomain = docs.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
    val total = perDomain.agg(sum(col("n_tokens")).as("total_tokens"))
    perDomain.crossJoin(broadcast(total))
      .select(col("domain"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast(DoubleType) / col("total_tokens"))
          .as("token_share"))
  }
}
