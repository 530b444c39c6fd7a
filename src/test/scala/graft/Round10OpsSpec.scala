package graft

import graft.oracle.SparkDialect
import graft.pipeline.Selection

/** Round-10 curation additions: token-budgeted DSIR selection and the
  * per-document curation ledger. */
class Round10OpsSpec extends SparkSpec {

  test("engine budget selection is row-identical to the direct windowed form") {
    // the oracle's rendering (global running-sum window) also runs on
    // Spark — the histogram-threshold engine path must reproduce it
    // bit-for-bit, boundary document and ties included
    graft.core.Tables.load(spark, sfDir, "documents")
      .createOrReplaceTempView("__r10_budget_docs")
    val direct = spark.sql(Selection.budgetSql("__r10_budget_docs")(SparkDialect))
      .collect().map(_.toSeq).toSeq
    val engine = Selection.runBudget(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(engine.nonEmpty)
    assert(engine == direct,
      s"first diff: ${engine.zip(direct).find { case (a, b) => a != b }}")
  }

  test("budget selection is greedy: selected docs are a prefix in score order") {
    val rows = Selection.runBudget(spark, sfDir).collect()
      .filter(r => r.getAs[Long]("token_ct") > 0)
      .sortBy(r => (-r.getAs[Long]("dsir_score"), r.getAs[Long]("doc_id")))
    val firstUnselected = rows.indexWhere(_.getAs[Int]("selected_budget") == 0)
    if (firstUnselected >= 0)
      assert(rows.drop(firstUnselected).forall(_.getAs[Int]("selected_budget") == 0),
        "selection is not a prefix of the greedy order")
    val selTokens = rows.takeWhile(_.getAs[Int]("selected_budget") == 1)
      .map(_.getAs[Long]("token_ct")).sum
    // every selected doc STARTS before the budget: total minus the
    // boundary doc must be under it
    if (firstUnselected > 0)
      assert(selTokens - rows(firstUnselected - 1).getAs[Long]("token_ct")
        < Selection.TokenBudget)
  }

  test("curation ledger covers every document with a consistent first-cause") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val ledger = Selection.runLedger(spark, sfDir).collect()
    assert(ledger.length == docs.count())
    val byDisp = ledger.groupBy(_.getAs[String]("disposition"))
    assert(byDisp.keySet.subsetOf(
      Set("contaminated", "dup_loser", "gate_fail", "kept")))
    assert(byDisp.contains("kept"), "fixture corpus must keep something")
    // dup_loser rows are exactly the non-survivor cluster members not
    // already claimed by contamination
    val comp = spark.table(graft.pipeline.Dedup.clusterCompView(spark, sfDir))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cid")).toMap
    val contam = ledger.filter(_.getAs[String]("disposition") == "contaminated")
      .map(_.getAs[Long]("doc_id")).toSet
    val losers = ledger.filter(_.getAs[String]("disposition") == "dup_loser")
      .map(_.getAs[Long]("doc_id")).toSet
    val expectedLosers = comp.collect {
      case (id, cid) if id != cid && !contam.contains(id) => id
    }.toSet
    assert(losers == expectedLosers,
      s"missing=${(expectedLosers -- losers).take(5)} extra=${(losers -- expectedLosers).take(5)}")
    // kept rows pass the gate
    val gate = spark.table(graft.pipeline.QualityGate.outView(spark, sfDir))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("keep")).toMap
    ledger.filter(_.getAs[String]("disposition") == "kept").foreach { r =>
      assert(gate(r.getAs[Long]("doc_id")) == 1,
        s"kept doc ${r.getAs[Long]("doc_id")} fails the gate")
    }
  }
}
