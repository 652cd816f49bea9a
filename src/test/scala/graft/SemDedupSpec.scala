package graft

/** SemDedup ground truth: within every cell of the op's OWN clustering,
  * recompute the cosine≥τ pair graph brute-force from the embeddings,
  * take union-find components, and demand identical groups, keepers and
  * sizes. (Cell assignment itself is pinned transitively — ann_ivf's
  * recall spec exercises the same trained quantizer.)
  */
class SemDedupSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private val Tau = 0.45

  test("semdedup groups equal brute-force within-cell components") {
    val out = SparkEntry.queries("semdedup")(spark, sf).collect()
    val byId = out.map { r =>
      r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("cell"), r.getAs[Long]("keep_id"),
          r.getAs[Long]("group_size"), r.getAs[Boolean]("is_kept")))
    }.toMap
    // unit vectors, identical arithmetic to the op (double cast, index-order sums)
    val us = graft.model.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
      .collect()
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        val n = math.sqrt(v.map(x => x * x).sum)
        r.getLong(0) -> v.map(_ / n)
      }.toMap
    assert(byId.keySet === us.keySet)
    // brute-force components inside each of the op's cells
    val parent = scala.collection.mutable.Map(byId.keys.map(i => i -> i).toSeq: _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    byId.keys.toSeq.sorted.combinations(2).foreach { case Seq(a, b) =>
      if (byId(a)._1 == byId(b)._1) {
        val cos = us(a).zip(us(b)).map { case (x, y) => x * y }.sum
        if (cos >= Tau) parent(find(a)) = find(b)
      }
    }
    val roots = byId.keys.map(i => i -> find(i)).toMap
    val comp = byId.keys.groupBy(roots)
    val want = comp.flatMap { case (_, ms) =>
      val keep = ms.min; val size = ms.size.toLong
      ms.map(m => m -> ((keep, size, m == keep)))
    }
    byId.foreach { case (id, (_, keepId, size, kept)) =>
      assert((keepId, size, kept) === want(id), s"doc $id")
    }
    val dupGroups = comp.values.count(_.size > 1)
    assert(dupGroups > 0, "no multi-member semantic groups at sf0.001 — spec vacuous")
    info(s"$dupGroups duplicate groups, ${out.count(!_.getAs[Boolean]("is_kept"))} rows quarantined")
  }
}
