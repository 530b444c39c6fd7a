package graft

import graft.pipeline.{Boilerplate, Dedup, Keywords}
import graft.oracle.SparkDialect

/** Round-14 optimization parity: every engine-side rewrite of this
  * round (window-based hot-fingerprint filter, window document
  * frequency, one-scan snapshot derivations) must emit a row set
  * BIT-IDENTICAL to the oracle-side rendering it replaced, on the same
  * session over the sf0.001 fixture. The sf0.01 gate re-proves each
  * end-to-end against DuckDB; this spec pins the equivalence at the
  * rendering level so a future edit to one side trips immediately. */
class OptRewriteParitySpec extends SparkSpec {

  private val dir = sfDir

  private def rows(sql: String): Seq[String] =
    spark.sql(sql).collect().map(_.toString).sorted.toSeq

  test("winnow pair body: window hot filter == census-join hot filter") {
    val fps = Dedup.winnowFpsView(spark, dir)
    assert(rows(Dedup.winnowBodySparkSql(fps)) ==
      rows(Dedup.winnowBodySql(fps)))
  }

  test("decontaminate body: window hot filter == census-join hot filter") {
    val fps = Dedup.winnowFpsView(spark, dir)
    assert(rows(Dedup.decontaminateBodySparkSql(fps)) ==
      rows(Dedup.decontaminateBodySql(fps)))
    assert(rows(Dedup.decontaminateReportSparkSql(fps)) ==
      rows(Dedup.decontaminateReportSql(fps)))
  }

  test("keywords: window document frequency == groupBy+join idf") {
    graft.core.Tables.load(spark, dir, "documents")
      .createOrReplaceTempView("__opt_kw_docs")
    assert(rows(Keywords.sparkSql("__opt_kw_docs")) ==
      rows(Keywords.sql("__opt_kw_docs")(SparkDialect)))
  }

  test("simhash candidates: window hot-bucket filter == census-join") {
    import graft.oracle.{SparkDialect => SD}
    graft.core.Tables.load(spark, dir, "documents")
      .createOrReplaceTempView("__opt_sh_docs")
    graft.functions.SimHashExpr.register(spark)
    val sigs = "__opt_sh_sigs"
    spark.sql(
      s"""SELECT id, v FROM (
         |  SELECT doc_id AS id, graft_simhash(text) AS v FROM __opt_sh_docs) s
         | WHERE v IS NOT NULL""".stripMargin)
      .localCheckpoint(eager = true).createOrReplaceTempView(sigs)
    assert(rows(Dedup.simhashBodySparkSql(sigs, 3)) ==
      rows(Dedup.simhashBody(sigs, 3)(SD)))
  }

  test("fk integrity: pre-aggregated census join == raw-row distinct aggregates") {
    import graft.inference.Referential
    val tabs = Seq("lineitem", "orders", "part", "supplier", "customer",
      "nation", "region", "events").map { t =>
      val v = s"__opt_fk_$t"
      graft.core.Tables.load(spark, dir, t, parallelize = false)
        .createOrReplaceTempView(v)
      t -> v
    }.toMap
    assert(rows(Referential.sparkSql(tabs)) == rows(Referential.sql(tabs)))
  }

  test("query aggregate family: fused single-exchange union == two-level regroup") {
    graft.core.Tables.registerAll(spark, dir)
    val fused = graft.querytests.QueryTests.tests.filter(_.sparkSql.isDefined)
    assert(fused.nonEmpty)
    for (t <- fused) {
      assert(rows(t.sparkSql.get(SparkDialect)) == rows(t.sql(SparkDialect)), t.name)
      (t.sparkLookup, t.lookup) match {
        case (Some(sl), Some(l)) =>
          assert(rows(sl(SparkDialect)) == rows(l(SparkDialect)), s"${t.name} lookup")
        case _ =>
      }
    }
  }

  test("boilerplate: window doc frequency == groupBy+join-back") {
    graft.core.Tables.load(spark, dir, "documents")
      .createOrReplaceTempView("__opt_bp_docs")
    val tg = "__opt_bp_tg"
    spark.sql(Boilerplate.tgSparkSql("__opt_bp_docs"))
      .localCheckpoint(eager = true).createOrReplaceTempView(tg)
    assert(rows(Boilerplate.bodySparkSql(tg)) ==
      rows(Boilerplate.bodySql(tg)))
  }
}
