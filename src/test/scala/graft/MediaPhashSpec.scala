package graft

import org.apache.spark.sql.functions._
import graft.ops.{ImageCodec, MultimodalOps}

/** Ground truth for the rows-only media_phash_dedup: the 4×16-band search
  * must be EXACT for Hamming ≤ 3 (pigeonhole: 3 flipped bits can break at
  * most 3 of the 4 bands), so the op's pairs are compared pair-for-pair
  * against a driver-side brute-force all-pairs scan over the REAL
  * pipeline's hashes (encode through the rotating codec mix — PPM/BMP/
  * PNG, plus GIF on the nb%5 slot — parse back, dHash the decoded
  * pixels) — no recall tolerance, strict set equality. A second test pins
  * that planted near-dup TEXTS actually produce near-dup IMAGES (the
  * non-vacuity the whole lane exists for).
  */
class MediaPhashSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val hashes = graft.model.Tables.documents(spark, sf)
    .select(col("doc_id"), col("text")).collect()
    .map { r =>
      r.getAs[Long]("doc_id") -> MultimodalOps.phash64(
        MultimodalOps.buildPhashPayload(r.getAs[String]("text").getBytes("UTF-8")))
    }

  test("the GIF rotation slot is populated and format-rotation never moves a hash bit") {
    val texts = graft.model.Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0).getBytes("UTF-8"))
    val gifSlot = texts.filter(_.length % 5 == 4)
    assert(gifSlot.nonEmpty, "no doc lands in the GIF slot - rotation vacuous")
    for (t <- gifSlot) {
      assert(ImageCodec.sniff(MultimodalOps.buildPhashPayload(t)).contains("gif"))
      // lossless codecs: the phash is a pixel function, not a byte function
      assert(MultimodalOps.phash64(MultimodalOps.buildPhashPayload(t)) ==
        MultimodalOps.phash64(MultimodalOps.buildPayload(t)))
    }
  }

  test("banded phash search equals brute-force all-pairs at Hamming <= 3") {
    val expected = (for {
      (ida, ha) <- hashes
      (idb, hb) <- hashes
      if ida < idb
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= 3
    } yield (ida, idb, d)).toSet
    assert(expected.nonEmpty, "fixture has no near-dup phashes - test is vacuous")

    val got = SparkEntry.queries("media_phash_dedup")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Int]("hamming"))).toSet
    assert(got == expected)
  }

  test("planted near-dup texts encode to images within phash Hamming <= 3") {
    // planted near-dups: adjacent-id-independent true 3-gram Jaccard >= 0.7
    val docs = graft.model.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def shingles(t: String): Set[String] = {
      val w = t.trim.split(" ")
      if (w.length < 3) Set.empty
      else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val sh = docs.map { case (id, t) => id -> shingles(t) }
    val ids = docs.keys.toSeq.sorted
    val planted = for {
      i <- ids; j <- ids if i < j
      si = sh(i); sj = sh(j)
      if si.nonEmpty && sj.nonEmpty
      if si.intersect(sj).size.toDouble / si.union(sj).size >= 0.7
    } yield (i, j)
    assert(planted.nonEmpty, "no planted near-dups — spec vacuous")
    val hm = hashes.toMap
    val close = planted.count { case (a, b) =>
      java.lang.Long.bitCount(hm(a) ^ hm(b)) <= 3
    }
    // dims bucket by /16 and /32 of byte length; a planted pair whose
    // lengths straddle a bucket boundary gets different dimensions and
    // may exceed the radius (a recall miss, as with real-image phash) —
    // demand the majority, not all
    assert(close * 2 > planted.size,
      s"only $close/${planted.size} planted near-dup pairs within Hamming 3")
  }
}
