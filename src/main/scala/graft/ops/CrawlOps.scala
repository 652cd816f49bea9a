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
