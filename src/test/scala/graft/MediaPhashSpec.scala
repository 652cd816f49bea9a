package graft

import org.apache.spark.sql.functions._
import graft.ops.MultimodalOps

/** Ground truth for the rows-only media_phash_dedup: the 4×16-band search
  * must be EXACT for Hamming ≤ 3 (pigeonhole: 3 flipped bits can break at
  * most 3 of the 4 bands), so the op's pairs are compared pair-for-pair
  * against a driver-side brute-force all-pairs scan of the same stub
  * phashes — no recall tolerance, strict set equality.
  */
class MediaPhashSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("banded phash search equals brute-force all-pairs at Hamming <= 3") {
    val hashes = graft.model.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        r.getAs[Long]("doc_id") ->
          MultimodalOps.stubPhash64(r.getAs[String]("text").getBytes("UTF-8"))
      }
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
}
