package graft

import graft.ops.CrawlOps

/** Rule-level ground truth for the crawl lane, independent of the
  * string-identical oracle reconstruction: URL canonicalization
  * invariants per rule, HTML extraction on a planted page with
  * hand-countable paragraphs, and link-graph conservation (every
  * synthesized href accounted for, all targets inside the domain
  * universe).
  */
class CrawlOpsSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("url_normalize enforces every canonicalization rule") {
    val rows = CrawlOps.urlNormalize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val norm = r.getAs[String]("norm_url")
      val domain = r.getAs[String]("domain")
      // scheme+host lowercase and www-stripped; PATH case is preserved
      val hostPart = norm.substring(norm.indexOf("://") + 3)
        .takeWhile(c => c != '/' && c != '?')
      assert(!hostPart.exists(_.isUpper) && !hostPart.startsWith("www."),
        s"case/www leak: $norm")
      assert(norm.takeWhile(_ != ':').forall(_.isLower), s"scheme case: $norm")
      assert(!norm.contains("utm_") && !norm.contains("gclid"), s"tracking leak: $norm")
      assert(!norm.contains("#"), s"fragment leak: $norm")
      assert(!norm.contains(":443") && !norm.contains(":80/"), s"default port leak: $norm")
      assert(norm.contains(":8080") == (id % 4 == 2), s"non-default port rule: $norm")
      assert(!norm.stripSuffix(norm.dropWhile(_ != '?')).endsWith("/"),
        s"trailing slash leak: $norm")
      assert(norm.contains(s"?id=$id"), s"real param must survive: $norm")
      assert(norm.contains("lang=en") == (id % 2 == 0), s"lang param rule: $norm")
      assert(domain.matches("src\\d+\\.(com|org|net)"), s"domain shape: $domain")
      assert(norm.startsWith(s"http://$domain") || norm.startsWith(s"https://$domain"))
      val dropped = r.getAs[Int]("n_params_dropped")
      val expectedDropped = 2 + (if (id % 7 == 0) 1 else 0) // utm x2 (+ gclid)
      assert(dropped == expectedDropped, s"doc $id dropped $dropped")
    }
  }

  test("html_extract on a planted page: hand-counted paragraphs and chars") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_html").toString
    // 45 words of 4 chars => 3 paragraphs (20/20/5); content chars =
    // 45*4 + 44 separating spaces re-joined as 20+20+5 words with two
    // inter-paragraph joiner spaces: lengths 99, 99, 24 + 2 = 224.
    // doc 6 (id%3==0) carries the ad block; doc 7 does not.
    val text = (1 to 45).map(i => f"w$i%03d").mkString(" ")
    Seq((6L, text), (7L, text)).toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'t' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CrawlOps.htmlExtract(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> (
        r.getAs[Int]("n_paragraphs"), r.getAs[Int]("content_chars"),
        r.getAs[Int]("total_chars"))).toMap
    assert(got(6L)._1 == 3 && got(7L)._1 == 3)
    assert(got(6L)._2 == 224 && got(7L)._2 == 224)
    // boilerplate delta, fully accounted: doc 6 renders the ad block
    // ("buy now limited offer" + separator = +22) while doc 7 renders one
    // extra link anchor (7%3+1 = 2 "ref"s vs 1, "ref " = -4) => +18
    assert(got(6L)._3 - got(7L)._3 == 18,
      s"boilerplate delta: ${got(6L)._3} vs ${got(7L)._3}")
  }

  test("link_graph conserves the synthesized hrefs inside the domain universe") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id").collect().map(_.getLong(0))
    val expectedTotal = docs.map(id => id % 3 + 1).sum
    val rows = CrawlOps.linkGraph(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_links")).sum == expectedTotal)
    rows.foreach { r =>
      assert(r.getAs[String]("src_domain").matches("src\\d+\\.(com|org|net)"))
      val dst = r.getAs[String]("dst_domain")
      assert(dst.matches("src\\d+\\.(org|net)"), s"dst outside universe: $dst")
      val k = dst.drop(3).takeWhile(_.isDigit).toInt
      assert(dst.endsWith(if (k < 10) ".org" else ".net"), s"tld rule: $dst")
    }
  }
}
