package graft

import graft.functions.WinnowFpsExpr
import graft.oracle.SparkDialect
import graft.pipeline.Dedup

/** The native winnowing expression must fingerprint BIT-IDENTICALLY to
  * the dual-rendered SQL pipeline (which stays the DuckDB oracle) — the
  * same contract knn_lsh_fold carries for the LSH bucket fold form. */
class WinnowExprSpec extends SparkSpec {

  private def sqlFps(view: String): Set[(Long, Long)] =
    spark.sql(Dedup.winnowFpsSql(view)(SparkDialect)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def exprFps(view: String): Set[(Long, Long)] = {
    WinnowFpsExpr.register(spark)
    spark.sql(
      s"""SELECT doc_id AS id, fp FROM $view
         | LATERAL VIEW explode(graft_winnow_fps(text)) e AS fp""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("expression fingerprints are row-set identical to the SQL form on the corpus") {
    graft.core.Tables.load(spark, sfDir, "documents")
      .createOrReplaceTempView("winnow_expr_docs")
    val sqlSet = sqlFps("winnow_expr_docs")
    val exprSet = exprFps("winnow_expr_docs")
    assert(sqlSet.nonEmpty)
    assert(exprSet == sqlSet,
      s"missing=${(sqlSet -- exprSet).take(5)} extra=${(exprSet -- sqlSet).take(5)}")
  }

  test("expression matches the SQL form on edge-case documents") {
    import spark.implicits._
    Seq(
      (1L, "short"),                       // below k+w-1: no fingerprints
      (2L, ""),                            // empty
      (3L, null.asInstanceOf[String]),     // NULL text
      (4L, "   MiXeD   Case\t\twith\nruns   of whitespace   "),
      (5L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaa"), // degenerate: one repeated gram
      (6L, "the quick brown fox jumps over the lazy dog again and again")
    ).toDF("doc_id", "text").createOrReplaceTempView("winnow_edge_docs")
    assert(exprFps("winnow_edge_docs") == sqlFps("winnow_edge_docs"))
  }

  test("native simhash signatures are bit-identical to the SQL form") {
    graft.functions.SimHashExpr.register(spark)
    graft.core.Tables.load(spark, sfDir, "documents")
      .createOrReplaceTempView("simhash_expr_docs")
    import spark.implicits._
    Seq((100001L, ""), (100002L, null.asInstanceOf[String]),
        (100003L, "  Tabs\tand\nnewlines  MIXED case  "),
        (100004L, "one"), (100005L, "dup dup dup words words"))
      .toDF("doc_id", "text").createOrReplaceTempView("simhash_edge_docs")
    for (view <- Seq("simhash_expr_docs", "simhash_edge_docs")) {
      val sqlSet = spark.sql(Dedup.simhashSigsSql(view)(SparkDialect))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exprSet = spark.sql(
        s"""SELECT id, v FROM (
           |  SELECT doc_id AS id, graft_simhash(text) AS v FROM $view) s
           | WHERE v IS NOT NULL""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(exprSet == sqlSet, s"drift on $view: " +
        s"missing=${(sqlSet -- exprSet).take(3)} extra=${(exprSet -- sqlSet).take(3)}")
    }
  }

  test("generated-code and interpreted paths agree") {
    // eval() (interpreted) vs the codegen'd SQL path on the same doc
    val text = "interpreted versus generated winnowing fingerprint check"
    val viaEval = WinnowFpsExpr.compute(text, 8, 4).toSet
    import spark.implicits._
    Seq((1L, text)).toDF("doc_id", "text")
      .createOrReplaceTempView("winnow_codegen_doc")
    val viaCodegen = exprFps("winnow_codegen_doc").map(_._2)
    assert(viaCodegen == viaEval)
  }
}
