package graft

import graft.scoring.Scoring

class ScoringSpec extends SparkSpec {

  test("normal CDF approximation is accurate") {
    val df = spark.sql(s"""SELECT ${Scoring.normalCdf("0.0")} AS c0,
      ${Scoring.normalCdf("1.96")} AS c196, ${Scoring.normalCdf("-1.96")} AS cn196,
      ${Scoring.normalCdf("7.0")} AS c7""")
    val r = df.collect().head
    assert(math.abs(r.getDouble(0) - 0.5) < 1e-6)
    assert(math.abs(r.getDouble(1) - 0.975) < 1e-3)
    assert(math.abs(r.getDouble(2) - 0.025) < 1e-3)
    assert(r.getDouble(3) == 1.0)
  }

  test("SUM_LN is the probability-no-issue product, 1 when empty") {
    val df = spark.sql(s"""SELECT g, ${Scoring.sumLn("p")} AS s FROM VALUES
      (1, 0.5), (1, 0.5), (2, CAST(NULL AS DOUBLE)), (3, 1.0) AS t(g, p) GROUP BY g ORDER BY g""")
    val rows = df.collect()
    assert(math.abs(rows(0).getDouble(1) - 0.25) < 1e-9) // (1-.5)(1-.5)
    assert(rows(1).getDouble(1) == 1.0)                  // NULL skipped
    assert(rows(2).getDouble(1) == 1.0)                  // 1.0 > 0.999999 skipped
  }

  test("failed tests get a prevalence in (0, 1]") {
    val rows = Scoring.runTestPrevalence(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val p = r.getAs[Double]("dq_prevalence"); p >= 0.0 && p <= 1.0
    })
  }

  test("score rollup yields per-table and run scores in [0, 1]") {
    val rows = Scoring.runScoreRollup(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("table_name")).contains("(run)"))
    assert(rows.forall { r =>
      val s = r.getAs[Double]("score"); s >= 0.0 && s <= 1.0
    })
  }

  test("weighted rollup inflates data points for weighted columns") {
    val plain = Scoring.runScoreRollup(spark, sfDir).collect()
      .map(r => r.getAs[String]("table_name") -> r.getAs[Double]("data_points")).toMap
    val weighted = Scoring.runWeightedScoreRollup(spark, sfDir).collect()
    assert(weighted.map(_.getAs[String]("table_name")).contains("(run)"))
    weighted.foreach { r =>
      val s = r.getAs[Double]("score")
      assert(s >= 0.0 && s <= 1.0)
      // every table holds at least one ID/weighted column, so weighted
      // data points strictly exceed the unweighted record-count sum
      assert(r.getAs[Double]("data_points") >= plain(r.getAs[String]("table_name")))
    }
  }

  test("score-card breakdowns keep the impact/score/issue_ct contract") {
    val cols = Scoring.runScoreCardColumns(spark, sfDir).collect()
    assert(cols.nonEmpty)
    // ordered by impact descending; scores in [0, 1]; issues non-negative
    val impacts = cols.map(_.getAs[Double]("impact"))
    assert(impacts.zip(impacts.tail).forall { case (a, b) => a >= b })
    assert(cols.forall { r =>
      val s = r.getAs[Double]("score"); s >= 0.0 && s <= 1.0
    })
    val dims = Scoring.runScoreCardDimensions(spark, sfDir).collect()
    assert(dims.nonEmpty)
    val dimImpacts = dims.map(_.getAs[Double]("impact"))
    assert(dimImpacts.zip(dimImpacts.tail).forall { case (a, b) => a >= b })
    // a column with issues scores below a clean one's 1.0
    assert(cols.exists(_.getAs[Double]("score") < 1.0))
  }

  test("score history lands two runs; dismissal never lowers the score") {
    val hist = Scoring.runScoreHistory(spark, sfDir).collect()
      .map(r => r.getAs[String]("run_id") -> r.getAs[Double]("score")).toMap
    assert(hist.keySet == Set("run_000", "run_001"))
    // run_001 dismissed an anomaly (disposition lifecycle), so its score
    // is >= run_000's — strictly greater when the finding exists at this SF
    assert(hist("run_001") >= hist("run_000"), hist.toString)
    assert(hist.values.forall(s => s > 0.0 && s <= 1.0))
  }
}
