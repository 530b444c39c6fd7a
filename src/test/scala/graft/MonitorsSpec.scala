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

  test("per-series tz offsets flow through the schedule path unchanged elsewhere") {
    // the events fixture updates uniformly around the clock, so its own
    // schedule is tz-invariant — the hand-computed tz scenarios live in
    // FreshnessSpec; here we assert the plumbing leaves offset-free
    // series bit-identical and runs green with an offset present
    val utc = Monitors.runSchedule(spark, sfDir).collect()
      .map(r => r.getAs[String]("series") -> r.toString).toMap
    val tz = Monitors.runSchedule(spark, sfDir,
      tzOffsetsSec = Map("events" -> 10 * 3600L)).collect()
      .map(r => r.getAs[String]("series") -> r.toString).toMap
    assert(tz("orders") == utc("orders"))
    assert(tz("lineitem") == utc("lineitem"))
  }

  test("PREDICT tolerances from landed history match the SARIMAX port") {
    import graft.streaming.{HolidayCalendar, TimeSeries}
    import spark.implicits._
    // constructed daily signal history: linear trend, 30 points
    val n = 30
    val day0 = java.time.LocalDate.parse("2024-01-01").toEpochDay * 86400L
    val ts = (0 until n).map(i => day0 + i * 86400L)
    val vals = (0 until n).map(i => 100.0 + 2.0 * i)
    val path = java.nio.file.Files
      .createTempDirectory("graft_pred").toString + "/sig"
    ts.zip(vals).map { case (t, v) =>
      ("s1", f"run_${(t - day0) / 86400L}%03d",
        new java.sql.Timestamp(t * 1000L), v)
    }.toDF("series", "run_id", "run_ts", "value").write.parquet(path)

    val out = Monitors.predictThresholdsFrom(spark, Seq(path)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("method") == "sarimax")
    assert(r.getAs[Int]("n_signals") == n)
    // bit-parity with the direct port over the identical history
    val holidays = HolidayCalendar.dates(Seq("US"), HolidayCalendar.yearsOf(ts))
    val (expLo, expHi) = TimeSeries.computeThreshold(ts, vals, "medium",
      excludeWeekends = true, holidays = holidays).get
    def r4(x: Double) = math.rint(math.max(x, 0.0) * 10000) / 10000
    assert(r.getAs[Double]("lower_tolerance") == r4(expLo))
    assert(r.getAs[Double]("upper_tolerance") == r4(expHi))
    // a linear series forecasts its continuation
    assert(math.abs(r.getAs[Double]("predicted") - (100.0 + 2.0 * n)) < 5.0)
  }

  test("PREDICT falls back to the stats band on short landed history") {
    import spark.implicits._
    val day0 = java.time.LocalDate.parse("2024-03-04").toEpochDay * 86400L
    val path = java.nio.file.Files
      .createTempDirectory("graft_pred2").toString + "/sig"
    Seq(10.0, 12.0, 11.0, 13.0, 9.0).zipWithIndex.map { case (v, i) =>
      ("s1", f"run_$i%03d", new java.sql.Timestamp((day0 + i * 86400L) * 1000L), v)
    }.toDF("series", "run_id", "run_ts", "value").write.parquet(path)
    val r = Monitors.predictThresholdsFrom(spark, Seq(path)).collect().head
    assert(r.getAs[String]("method") == "stats_fallback")
    val vals = Seq(10.0, 12.0, 11.0, 13.0, 9.0)
    val mean = vals.sum / vals.length
    val sd = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / (vals.length - 1))
    def r4(x: Double) = math.rint(x * 10000) / 10000
    assert(r.getAs[Double]("lower_tolerance") == r4(math.max(mean - 2 * sd, 0.0)))
    assert(r.getAs[Double]("upper_tolerance") == r4(mean + 2 * sd))
  }
}
