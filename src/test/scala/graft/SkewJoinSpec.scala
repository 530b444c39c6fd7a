package graft

import graft.core.{SkewJoin, Tables}

/** Salted-join parity: fanning a skewed key over sub-keys must never
  * change the join's answer, only its task-size distribution. */
class SkewJoinSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.selectExpr(cols: _*).collect()
      .map(_.mkString("")).sorted.toSeq
  }

  test("uniform salted join is row-identical to the plain join") {
    val big = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_quantity")
    val dim = Tables.load(spark, sfDir, "supplier")
      .select("s_suppkey", "s_name", "s_nationkey")
      .withColumnRenamed("s_suppkey", "l_suppkey")
    val plain = big.join(dim, Seq("l_suppkey"))
    val salted = SkewJoin.saltedJoin(big, dim, "l_suppkey", salt = 8)
    assert(salted.columns.sorted.toSeq == plain.columns.sorted.toSeq)
    assert(canon(salted) == canon(plain))
    val p = salted.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
  }

  test("two-tier hot-key salted join is row-identical to the plain join") {
    val big = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_quantity")
    val dim = Tables.load(spark, sfDir, "supplier")
      .select("s_suppkey", "s_name").withColumnRenamed("s_suppkey", "l_suppkey")
    val hot = SkewJoin.hotKeys(big, "l_suppkey", threshold = 0.05)
    val salted = SkewJoin.saltedJoinHot(big, dim, "l_suppkey", hot, salt = 8)
    val plain = big.join(dim, Seq("l_suppkey"))
    assert(canon(salted) == canon(plain))
  }

  test("salt draw is deterministic across recomputation") {
    val big = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_quantity")
    val dim = Tables.load(spark, sfDir, "supplier")
      .select("s_suppkey", "s_name").withColumnRenamed("s_suppkey", "l_suppkey")
    val once = canon(SkewJoin.saltedJoin(big, dim, "l_suppkey", salt = 4))
    val again = canon(SkewJoin.saltedJoin(big, dim, "l_suppkey", salt = 4))
    assert(once == again, "replayed salted join changed its answer")
  }
}
