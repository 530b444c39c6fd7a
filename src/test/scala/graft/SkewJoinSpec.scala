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

  test("incremental hits frame: salted dispatch engages on a hot fp and matches the SQL") {
    import spark.implicits._
    // synthetic skewed fingerprint relation: fp "hot" shared by 40
    // LANDED docs (4% of landed rows — above the 1% advisor threshold,
    // under the 50-doc cutoff) plus a unique fp per doc. Batch docs are
    // id % 10 == 7.
    val rows = (1L to 100L).flatMap { id =>
      Seq((id, s"u$id"), (id, s"u${id}b"), (id, s"u${id}c")) ++
        (if (id <= 40 && id % 10 != 7) Seq((id, "hot")) else Nil) ++
        (if (id % 10 == 7 && id <= 40) Seq((id, "hot"), (id, s"u${id - 1}"),
          (id, s"u${id - 1}b")) else Nil)
    }
    rows.toDF("id", "fp").createOrReplaceTempView("__skew_fps")
    // the advisor must fire on the synthetic histogram
    val landf = spark.table("__skew_fps")
      .where("id % 10 <> 7")
    assert(SkewJoin.hotKeys(landf, "fp", 0.01).contains("hot"),
      "fixture does not trip the advisor")
    val viaFrame = graft.pipeline.Dedup
      .incrementalHitsFrame(spark, "__skew_fps", minShared = 2)
    // the salted two-tier join is IN the engaged plan
    val p = viaFrame.queryExecution.executedPlan.toString
    assert(p.contains("__salt"), s"salted dispatch did not engage:\n${p.take(800)}")
    val viaSql = spark.sql(
      graft.pipeline.Dedup.incrementalHitsSql("__skew_fps", minShared = 2))
    assert(canon(viaFrame) == canon(viaSql),
      "skew-dispatched hits diverge from the SQL relation")
    assert(viaFrame.count() > 0, "fixture produced no hits")
  }

  test("candidate-verify frame: salted dispatch engages on a hub doc and matches the SQL") {
    import spark.implicits._
    // synthetic hub: doc 1 is a candidate pair with every other doc
    // (>1% of all pairs), a few background pairs keep the histogram real
    val cands = ((2L to 60L).map(b => (1L, b)) ++
      Seq((2L, 3L), (4L, 5L), (6L, 7L))).toDF("doc_a", "doc_b")
    val shf = (1L to 60L).flatMap { id =>
      Seq((id, "s1"), (id, s"s$id"), (id, s"t${id % 7}"))
    }.toDF("id", "shingle")
    cands.createOrReplaceTempView("__skew_cands")
    shf.createOrReplaceTempView("__skew_shf")
    assert(SkewJoin.hotKeys(cands, "doc_a", 0.01).contains(1L))
    val viaFrame = graft.pipeline.Dedup.candInterFrame(spark, cands, shf)
    val p = viaFrame.queryExecution.executedPlan.toString
    assert(p.contains("__salt"), s"salted dispatch did not engage:\n${p.take(800)}")
    val viaSql = spark.sql(
      """SELECT c.doc_a, c.doc_b, COUNT(*) AS ict
        |  FROM __skew_cands c
        |  JOIN __skew_shf a ON a.id = c.doc_a
        |  JOIN __skew_shf b ON b.id = c.doc_b AND b.shingle = a.shingle
        | GROUP BY c.doc_a, c.doc_b""".stripMargin)
    assert(canon(viaFrame) == canon(viaSql),
      "skew-dispatched verify join diverges from the SQL relation")
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
