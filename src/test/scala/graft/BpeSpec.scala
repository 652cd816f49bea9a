package graft

import org.apache.spark.sql.functions._

import graft.ops.BpeOps

/** Ground truth for the BPE trainer: an independent driver-side
  * reimplementation (plain Scala maps, no Spark) trained on the same
  * word frequencies must produce the identical merge table, on both a
  * hand-checkable classic corpus and the real documents fixture. The
  * application side (bpe_segment) is pinned by brute-force re-tokenizing
  * every word under the learned merges.
  */
class BpeSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  /** Reference trainer: word-frequency map → first k merges with the
    * operator's contract (count desc, then lexicographic (l, r) tiebreak;
    * non-overlapping left-to-right application).
    */
  private def refTrain(freq: Map[String, Long], k: Int): Seq[(String, String, Long)] = {
    def applyMerge(seg: Vector[String], l: String, r: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < seg.length) {
        if (i + 1 < seg.length && seg(i) == l && seg(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += seg(i); i += 1 }
      }
      out.result()
    }
    var segs = freq.toSeq.map { case (w, n) => (w.map(_.toString).toVector, n) }
    val merges = Seq.newBuilder[(String, String, Long)]
    var round = 0
    var done = false
    while (round < k && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      segs.foreach { case (seg, n) =>
        seg.indices.dropRight(1).foreach { i =>
          val p = (seg(i), seg(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + n
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), cnt) = counts.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((l, r, cnt))
        segs = segs.map { case (seg, n) => (applyMerge(seg, l, r), n) }
        round += 1
      }
    }
    merges.result()
  }

  private def wordFreq(dir: String): Map[String, Long] = {
    import spark.implicits._
    graft.model.Tables.documents(spark, dir)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count().as[(String, Long)].collect().toMap
  }

  test("classic corpus: merges match the independent trainer and are hand-sane") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("bpe_classic").toString
    // Sennrich et al.'s running example, frequencies chosen so the first
    // merges are unambiguous: 'es' (9) then 'est' (9) then 'lo' (7)
    val docs = Seq(
      (1L, ("low " * 5).trim, "en", "web", 0L),
      (2L, ("lower " * 2).trim, "en", "web", 0L),
      (3L, ("newest " * 6).trim, "en", "book", 0L),
      (4L, ("widest " * 3).trim, "en", "book", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val got = BpeOps.bpeMerges(spark, tmp, k = 6).collect()
      .sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    val want = refTrain(Map("low" -> 5L, "lower" -> 2L,
      "newest" -> 6L, "widest" -> 3L), 6)
    assert(got.toSeq === want)
    assert(got.head === (("e", "s", 9L)), "first merge must be (e,s) ×9")
    assert(got(1) === (("es", "t", 9L)), "second merge builds on the first")
  }

  test("documents fixture: full merge table matches the independent trainer") {
    val got = BpeOps.bpeMerges(spark, sf, k = 8).collect()
      .sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    val want = refTrain(wordFreq(sf), 8)
    assert(got.toSeq === want)
  }

  test("bpe_segment token counts match brute-force application per source") {
    import spark.implicits._
    val merges = BpeOps.bpeMerges(spark, sf, k = 8).collect()
      .sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getString(1), r.getString(2)))
    def tokenize(w: String): Vector[String] =
      merges.foldLeft(w.map(_.toString).toVector) { case (seg, (l, r)) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < seg.length) {
          if (i + 1 < seg.length && seg(i) == l && seg(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += seg(i); i += 1 }
        }
        out.result()
      }
    val want = graft.model.Tables.documents(spark, sf)
      .select(col("source"), col("text")).as[(String, String)].collect()
      .flatMap { case (src, text) =>
        text.toLowerCase.split(" ").filter(_.nonEmpty).map(w => (src, w))
      }
      .groupBy(_._1).map { case (src, ws) =>
        val toks = ws.map(w => tokenize(w._2))
        (src, ws.map(_._2.length.toLong).sum, toks.map(_.length.toLong).sum)
      }.toSet
    val got = BpeOps.bpeSegment(spark, sf, k = 8).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    // the learned vocabulary must actually compress: fewer tokens than chars
    got.foreach { case (src, nChars, nToks) =>
      assert(nToks < nChars, s"$src: $nToks tokens vs $nChars chars")
    }
  }

  test("bpe_fertility is consistent with bpe_segment and the word census") {
    import spark.implicits._
    val seg = BpeOps.bpeSegment(spark, sf, k = 8).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val words = graft.model.Tables.documents(spark, sf)
      .select(col("source"), col("text")).as[(String, String)].collect()
      .flatMap { case (src, text) =>
        text.toLowerCase.split(" ").filter(_.nonEmpty).map(_ => src)
      }
      .groupBy(identity).map { case (s, g) => s -> g.length.toLong }
    val got = BpeOps.bpeFertility(spark, sf, k = 8).collect().map { r =>
      r.getAs[String]("source") -> (
        r.getAs[Long]("n_words"), r.getAs[Long]("n_pieces"),
        r.getAs[Long]("n_chars"), r.getAs[Double]("fertility"),
        r.getAs[Double]("chars_per_piece"))
    }.toMap
    assert(got.keySet == seg.keySet)
    for ((src, (nw, np, nc, f, cpp)) <- got) {
      assert(nw == words(src), s"$src word census")
      assert((nc, np) == seg(src), s"$src must share bpe_segment's counts")
      assert(f == np.toDouble / nw.toDouble && cpp == nc.toDouble / np.toDouble)
      // fertility strictly between 1 (every word one piece) and
      // chars-per-word (no merge ever applied) — the metric is live
      assert(f > 1.0 && f < nc.toDouble / nw.toDouble, s"$src fertility $f")
    }
  }
}
