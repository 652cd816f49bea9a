package graft

/** Ground truth for the typed-extension surface (CustomOps): the oracle
  * gate already proves typed_cogroup agrees with its relational twin;
  * this spec replays the typed semantics driver-side and guards the
  * branches the fixture must actually exercise (matched keys and at
  * least one orphan side — a fixture with perfect referential integrity
  * everywhere would leave the NULL branches dead).
  */
class CustomOpsSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("typed_cogroup reconciles per-key cardinalities and exact decimal totals") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderkey", "CAST(o_totalprice AS DECIMAL(18,2)) AS tp")
      .collect().map(r => r.getLong(0) -> r.getDecimal(1))
    val items = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_orderkey",
        """CAST(l_extendedprice AS DECIMAL(12,2))
          | * (1 - CAST(l_discount AS DECIMAL(4,2)))
          | * (1 + CAST(l_tax AS DECIMAL(4,2))) AS gross""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getDecimal(1))
    val oBy = orders.groupBy(_._1)
    val iBy = items.groupBy(_._1)
    val got = SparkEntry.queries("typed_cogroup")(spark, sf).collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        ((r.getAs[Long]("n_orders"), r.getAs[Long]("n_items"),
          Option(r.getAs[java.lang.Double]("total_price")),
          Option(r.getAs[java.lang.Double]("items_gross"))))).toMap
    assert(got.keySet == oBy.keySet ++ iBy.keySet)
    for (k <- got.keySet) {
      val os = oBy.getOrElse(k, Array.empty)
      val is = iBy.getOrElse(k, Array.empty)
      val tp = os.map(_._2).reduceOption((a, b) =>
        if (a.compareTo(b) <= 0) a else b).map(_.doubleValue)
      val gross =
        if (is.isEmpty) None
        else Some(is.map(_._2)
          .foldLeft(java.math.BigDecimal.ZERO)(_ add _).doubleValue)
      assert(got(k) == ((os.length.toLong, is.length.toLong,
        tp.map(java.lang.Double.valueOf), gross.map(java.lang.Double.valueOf))), s"key $k")
    }
    // branch coverage: matched keys with multiple items, and at least
    // one orphan side (the fixture ships referential violations —
    // orphan_fk_check exists because of them)
    assert(got.values.exists(v => v._1 == 1L && v._2 > 1L), "no matched multi-item key")
    assert(got.values.exists(v => v._1 == 0L || v._2 == 0L), "no orphan key — NULL branch dead")
  }
}
