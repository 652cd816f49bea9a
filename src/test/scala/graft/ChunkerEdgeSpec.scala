package graft

import org.apache.spark.sql.functions._

import graft.ops.PipelineOps

/** Boundary pins for the sliding-window chunker, on synthetic documents at
  * the exact grid edges (a review pass already caught one boundary bug
  * here: trailing starts whose windows were strict suffixes of the
  * previous chunk). The rule: starts are multiples of 32, and the grid
  * stops at the FIRST window reaching the document end — so a doc of n
  * tokens yields max(1, ceil((n − 32) / 32)) chunks... pinned here by
  * explicit cases rather than a rederived formula.
  */
class ChunkerEdgeSpec extends SparkSuite {

  private lazy val dir: String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("chunk_edge").toString
    def doc(id: Long, n: Int) = (id, (1 to n).map(i => s"w$i").mkString(" "))
    // token counts straddling every grid boundary, plus empty/whitespace
    // docs (ids 90-92) that the chunker must DROP: split(trim(''), ' ')
    // is [''], which would otherwise emit one empty-token chunk per doc,
    // all sharing one md5 — chunk_dedup would report them as duplicates
    (Seq(doc(1, 1), doc(2, 31), doc(3, 32), doc(4, 33), doc(5, 64),
      doc(6, 65), doc(7, 96), doc(8, 97), doc(9, 128), doc(10, 129)) ++
      Seq((90L, ""), (91L, " "), (92L, "     ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("chunk count and sizes at exact grid boundaries") {
    val got = PipelineOps.docChunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2))
      .groupBy(_._1._1)
      .map { case (id, rows) => id -> rows.toSeq.sortBy(_._1._2).map(_._2) }
    // (doc tokens -> expected chunk sizes): one chunk until 33 tokens;
    // the last kept start is the largest multiple of 32 below n-32
    val expected = Map(
      1L -> Seq(1),        // 1 token
      2L -> Seq(31),       // 31
      3L -> Seq(32),       // 32: single window covers all
      4L -> Seq(33),       // 33: first window still reaches the end
      5L -> Seq(64),       // 64: one full window
      6L -> Seq(64, 33),   // 65: starts 0, 32
      7L -> Seq(64, 64),   // 96: starts 0, 32 (window at 32 ends exactly at 96)
      8L -> Seq(64, 64, 33), // 97: starts 0, 32, 64
      9L -> Seq(64, 64, 64), // 128: starts 0, 32, 64
      10L -> Seq(64, 64, 64, 33)) // 129: starts 0, 32, 64, 96
    // keySet equality doubles as the empty-doc pin: docs 90-92 (empty /
    // whitespace-only) must produce NO chunks at all
    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, sizes) => assert(got(id) === sizes, s"doc $id") }
  }

  test("no chunk is a suffix of the previous chunk (no stride artifacts)") {
    // every non-final chunk must be full-width (64), and consecutive
    // chunks of a doc overlap by exactly 32 tokens — a trailing sub-window
    // would surface as a short non-final chunk or a >32 overlap
    PipelineOps.docChunks(spark, dir).collect()
      .groupBy(_.getLong(0)).foreach { case (id, rows) =>
        val sizes = rows.sortBy(_.getInt(1)).map(_.getInt(2)).toSeq
        sizes.dropRight(1).foreach(s => assert(s === 64, s"doc $id sizes $sizes"))
      }
  }
}
