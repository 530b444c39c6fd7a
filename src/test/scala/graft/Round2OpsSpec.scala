package graft

import graft.inference.{Contingency, SchemaDrift}
import graft.pipeline.Dedup
import graft.scoring.Scoring
import graft.streaming.Monitors

class Round2OpsSpec extends SparkSpec {

  test("schema drift reports the seeded A/D/M changes") {
    val rows = SchemaDrift.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set(
      ("events", "props", "A"),
      ("orders", "o_comment", "D"),
      ("customer", "c_acctbal", "M")))
  }

  test("trend forecast bands bracket a stable daily signal") {
    val rows = Monitors.runTrendForecast(spark, sfDir).collect()
    val warm = rows.filter(_.getAs[Long]("n_obs") >= 10)
    assert(warm.nonEmpty)
    // most in-sample days of a stationary series stay inside the band
    val breaches = warm.count(_.getAs[Int]("breach") == 1)
    assert(breaches <= warm.length / 2)
  }

  test("freshness gap thresholds computed for all monitored tables") {
    val rows = Monitors.runFreshnessGaps(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet == Set("events", "orders", "lineitem"))
    for (r <- rows if r.getAs[Long]("gap_ct") >= 5) {
      assert(r.getAs[Double]("gap_p95_min") >= r.getAs[Double]("gap_p50_min"))
      assert(r.getAs[Double]("threshold_min") > r.getAs[Double]("gap_p95_min"))
    }
  }

  test("contingency rules satisfy support and confidence floors") {
    val rows = Contingency.run(spark, sfDir).collect()
    for (r <- rows) {
      assert(r.getAs[Long]("support") >= 100L)
      assert(r.getAs[Double]("confidence") >= 0.6)
    }
  }

  test("embedding near-dup pairs are label-bucketed and above threshold") {
    val rows = Dedup.runEmbedding(spark, sfDir).collect()
    assert(rows.forall(_.getAs[Double]("cosine") >= 0.30))
  }

  test("score cards yield dimension scores in [0, 1] per table") {
    val rows = Scoring.runScoreCard(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val s = r.getAs[Double]("score")
      assert(s >= 0.0 && s <= 1.0)
      assert(Set("Validity", "Completeness", "Consistency", "Uniqueness",
        "Accuracy", "Timeliness").contains(r.getAs[String]("dq_dimension")))
    }
  }

  test("hygiene screens include the round-2 anomaly types when criteria fire") {
    val all = graft.inference.HygieneScreens.screens.map(_.name) ++
      graft.inference.HygieneScreens.multiColScreens.map(_._1)
    assert(all.contains("Potential_PII"))
    assert(all.contains("Invalid_Zip_USA"))
    assert(all.contains("Table_Pattern_Mismatch"))
  }
}
