package graft

import graft.pipeline.Multimodal
import graft.streaming.Monitors

class MonitorsSpec extends SparkSpec {

  test("volume bands bracket the daily signal after warmup") {
    val rows = Monitors.runVolumeBands(spark, sfDir).collect()
    assert(rows.length >= 20)
    val warm = rows.filter(_.getAs[Long]("n_obs") >= 5)
    assert(warm.forall { r =>
      r.getAs[Double]("lower_band") <= r.getAs[Double]("upper_band")
    })
    // breaches are rare for a stationary synthetic series
    assert(warm.count(_.getAs[Int]("breach") == 1) < warm.length / 2)
  }

  test("freshness fingerprints are stable 32-char hashes per table") {
    val rows = Monitors.runFreshness(spark, sfDir).collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[String]("fingerprint").length == 32))
  }

  test("multimodal SQL features are deterministic and bounded") {
    val rows = Multimodal.run(spark, sfDir).collect()
    assert(rows.length == 500)
    assert(rows.forall { r =>
      val f = r.getAs[Double]("feat_0"); f >= 0.0 && f <= 1.0
    })
  }

  test("typed mapPartitions feature extraction matches payload sizes") {
    val df = Multimodal.extractFeatures(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getAs[Seq[Double]]("features").length == 4))
  }

  test("daily active schedules get deadline-based upper thresholds") {
    val rows = Monitors.runSchedule(spark, sfDir).collect()
      .map(r => r.getAs[String]("series") -> r).toMap
    val li = rows("lineitem")
    assert(li.getAs[String]("stage") == "active")
    assert(li.getAs[String]("frequency") == "daily")
    // non-sub-daily active: upper = business minutes to the next
    // deadline — window end 0.0 + medium 3h buffer on the next active
    // day = 27h (test_thresholds_prediction.py:249-257 semantics)
    assert(li.getAs[Double]("upper_min") == 27 * 60.0, li)
    // sub-daily series keep the within-window gap threshold
    val ev = rows("events")
    assert(ev.getAs[String]("frequency") == "sub_daily")
    assert(ev.getAs[Double]("upper_min") < 27 * 60.0, ev)
  }
}
