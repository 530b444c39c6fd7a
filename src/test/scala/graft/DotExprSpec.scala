package graft

/** Bit-identity of the native `graft_dot` with the higher-order-
  * function SQL rendering it replaced (the DuckDB oracle keeps
  * list_dot_product — the same sequential sum). */
class DotExprSpec extends SparkSpec {

  private val hof =
    "aggregate(zip_with(%s, %s, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))," +
      " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  test("graft_dot is bit-identical to the HOF fold on the fixture corpus") {
    graft.functions.DotExpr.register(spark)
    graft.core.Tables.load(spark, sfDir, "embeddings")
      .createOrReplaceTempView("__graft_dot_emb")
    // every pairwise (i, i+1) dot over float arrays, both renderings
    val rows = spark.sql(
      s"""SELECT graft_dot(a.embedding, b.embedding) AS nat,
         |       ${hof.format("a.embedding", "b.embedding")} AS hofv
         |  FROM __graft_dot_emb a JOIN __graft_dot_emb b
         |    ON b.vec_id = a.vec_id + 1""".stripMargin).collect()
    assert(rows.length > 100)
    rows.foreach { r =>
      val n = java.lang.Double.doubleToRawLongBits(r.getAs[Double]("nat"))
      val h = java.lang.Double.doubleToRawLongBits(r.getAs[Double]("hofv"))
      assert(n == h, s"bitwise mismatch: ${r.getAs[Double]("nat")}")
    }
  }

  test("graft_dot handles double arrays, length mismatch and nulls like zip_with") {
    graft.functions.DotExpr.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.5D, 2.5D), array(2.0D, 4.0D)) AS dd,
        |       graft_dot(array(1.0D), array(1.0D, 2.0D)) AS mismatch,
        |       graft_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS withnull
        |""".stripMargin).collect()(0)
    assert(r.getAs[Double]("dd") == 13.0)
    assert(r.isNullAt(r.fieldIndex("mismatch")))
    assert(r.isNullAt(r.fieldIndex("withnull")))
  }
}
