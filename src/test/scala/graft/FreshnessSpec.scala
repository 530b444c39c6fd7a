package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Freshness

/** Scenario tests for the freshness-service port, in the reference's
  * constructed-history style (reference:
  * tests/unit/common/test_freshness_scenarios.py). Timestamps are epoch
  * seconds; 2026-08-03 00:00 UTC epoch-day is a Monday. */
class FreshnessSpec extends AnyFunSuite {
  private val day = 86400L
  private val hour = 3600L
  // Monday 2026-08-03 00:00 UTC
  private val monday: Long = java.time.LocalDate.of(2026, 8, 3).toEpochDay * day

  /** Daily weekday updates at 07:00 for n weeks. */
  private def weekdayDaily(weeks: Int): Seq[Long] =
    for {
      w <- 0 until weeks
      d <- 0 until 5
    } yield monday + (w * 7L + d) * day + 7 * hour

  test("percentile matches numpy linear interpolation") {
    val a = Seq(1.0, 2.0, 3.0, 4.0)
    assert(Freshness.percentile(a, 50) == 2.5)
    assert(Freshness.percentile(a, 25) == 1.75)
    assert(Freshness.percentile(a, 100) == 4.0)
  }

  test("weekday maps Monday=0 and Sunday=6") {
    assert(Freshness.weekday(monday) == 0)
    assert(Freshness.weekday(monday + 6 * day) == 6)
  }

  test("gap threshold without exclusions sees the weekend as a long gap") {
    val t = Freshness.gapThreshold(weekdayDaily(3), "medium")
    // gaps: 24h × weekdays, 72h Fri→Mon; p95 floor pushes upper near 72h×1.25
    assert(t.upper >= 72 * 60.0)
    assert(t.staleness > 0)
    assert(t.lastUpdateSec == weekdayDaily(3).max)
  }

  test("weekend exclusion normalizes the Fri->Mon gap to a business day") {
    val times = weekdayDaily(3)
    val excl = Freshness.gapThreshold(times, "medium", excludeWeekends = true)
    val noExcl = Freshness.gapThreshold(times, "medium")
    // after subtracting Sat+Sun, every gap is 24h (1440 business minutes)
    assert(excl.upper == 1440 * 1.25)
    assert(excl.upper < noExcl.upper)
    assert(excl.lower.contains(1440.0))
  }

  test("excluded minutes counts weekends, holidays, and off-window hours") {
    def sec(d: String, h: Int = 0) =
      java.time.LocalDate.parse(d).toEpochDay * day + h * hour
    // Fri 00:00 -> Mon 00:00 with weekend exclusion = 2 full days
    // (mirrors tests/unit/common/test_time_series_service.py:203-213)
    assert(Freshness.excludedMinutes(sec("2026-02-06"), sec("2026-02-09"),
      Set.empty, excludeWeekends = true) == 2 * 1440.0)
    // Wednesday holiday inside Mon -> Fri = 1 day (test_holiday :223-229)
    assert(Freshness.excludedMinutes(sec("2026-02-02"), sec("2026-02-06"),
      Set.empty, holidays = Set("2026-02-04")) == 1440.0)
    // 9-17 active window: 17:00 -> next-day 09:00 is entirely off-window
    assert(Freshness.excludedMinutes(sec("2026-02-03", 17), sec("2026-02-04", 9),
      Set.empty, windowStart = Some(9.0), windowEnd = Some(17.0)) == 960.0)
    // within the window nothing is excluded
    assert(Freshness.excludedMinutes(sec("2026-02-03", 10), sec("2026-02-03", 16),
      Set.empty, windowStart = Some(9.0), windowEnd = Some(17.0)) == 0.0)
  }

  test("9-to-5 schedule: window exclusion states thresholds in business minutes") {
    // updates at 09:00, 13:00, 17:00 every day for 30 days
    val times: Seq[Long] =
      for (i <- 0 until 30; h <- Seq(9, 13, 17)) yield monday + i * day + h * hour
    val sched = Freshness.inferSchedule(times)
    assert(sched.exists(s => s.stage == "active" && s.frequency == "sub_daily"))
    val p = Freshness.scheduleParams(sched)
    assert(p.windowStart.contains(9.0) && p.windowEnd.contains(17.0))
    assert(p.excludedDays.isEmpty) // active every day of the week
    val biz = Freshness.gapThreshold(times, "medium",
      excludedDays = p.excludedDays,
      windowStart = p.windowStart, windowEnd = p.windowEnd)
    val wall = Freshness.gapThreshold(times, "medium")
    // the overnight 17:00 -> 09:00 gap (960 wall minutes) normalizes to
    // 0 business minutes; the 4 h in-window cadence drives the threshold
    assert(biz.upper == 240 * 1.25, s"biz upper ${biz.upper}")
    assert(wall.upper == 960 * 1.25, s"wall upper ${wall.upper}")
    assert(biz.staleness == 240 * 0.85)
    assert(biz.lower.isEmpty) // P10 of normalized gaps is 0 -> no lower
  }

  test("holiday break does not inflate thresholds when the calendar is applied") {
    import graft.streaming.HolidayCalendar
    val holidays = HolidayCalendar.dates(Seq("US"), 2026 to 2026)
    // Independence Day 2026 is a Saturday: observed Friday 7/3 + actual 7/4
    assert(holidays.contains("2026-07-03") && holidays.contains("2026-07-04"))
    // daily noon updates Jun 22 - Jul 10 2026, skipping the holiday break
    val start = java.time.LocalDate.parse("2026-06-22")
    val times = (0 until 19).map(start.plusDays(_))
      .filterNot(d => d.toString == "2026-07-03" || d.toString == "2026-07-04")
      .map(d => d.toEpochDay * day + 12 * hour)
    val biz = Freshness.gapThreshold(times, "medium", holidays = holidays)
    val wall = Freshness.gapThreshold(times, "medium")
    // the 3-day break (4320 wall minutes) normalizes to one business day
    assert(biz.upper == 1440 * 1.25, s"biz upper ${biz.upper}")
    assert(wall.upper == 4320 * 1.25, s"wall upper ${wall.upper}")
  }

  test("too few gaps raises NotEnoughData") {
    intercept[Freshness.NotEnoughData] {
      Freshness.gapThreshold(Seq(0L, day, 2 * day), "medium")
    }
  }

  test("frequency bands classify sub-daily, daily, weekly, irregular") {
    assert(Freshness.classifyFrequency(Seq(1.0, 2.0, 3.0)) == "sub_daily")
    assert(Freshness.classifyFrequency(Seq(24.0, 24.0, 72.0)) == "daily")
    assert(Freshness.classifyFrequency(Seq(168.0, 168.0)) == "weekly")
    assert(Freshness.classifyFrequency(Seq(48.0, 48.0)) == "irregular") // MWF band
    assert(Freshness.classifyFrequency(Nil) == "irregular")
  }

  test("active days detect the weekday pattern") {
    val days = Freshness.detectActiveDays(weekdayDaily(5))
    assert(days.contains(Set(0, 1, 2, 3, 4)))
    // under 3 weeks of data → None
    assert(Freshness.detectActiveDays(weekdayDaily(2)).isEmpty)
  }

  test("update window brackets the 07:00 cadence") {
    val Some((p10, p90)) = Freshness.detectUpdateWindow(weekdayDaily(5), Set(0, 1, 2, 3, 4))
    assert(p10 == 7.0 && p90 == 7.0)
  }

  test("update window handles midnight-wrapping clusters") {
    // alternating 23:30 and 00:30 updates, every day for 4 weeks
    val times = (0 until 28).flatMap { d =>
      Seq(monday + d * day + 23 * hour + 1800, monday + d * day + 1800)
    }
    val Some((p10, p90)) = Freshness.detectUpdateWindow(times, (0 until 7).toSet)
    assert(p10 >= 22.0 || p10 <= 1.0, s"p10=$p10")
    assert(p90 >= 23.0 || p90 <= 2.0, s"p90=$p90")
  }

  test("regular weekday schedule infers as active with high confidence") {
    val Some(s) = Freshness.inferSchedule(weekdayDaily(5))
    assert(s.stage == "active")
    assert(s.frequency == "daily")
    assert(s.activeDays == Set(0, 1, 2, 3, 4))
    assert(s.confidence >= 0.95)
    assert(s.numEvents == 25)
  }

  test("MWF cadence classifies irregular frequency but active stage") {
    val mwf = for {
      w <- 0 until 8
      d <- Seq(0, 2, 4)
    } yield monday + (w * 7L + d) * day + 6 * hour
    val Some(s) = Freshness.inferSchedule(mwf)
    assert(s.frequency == "irregular") // 48h gaps fall between bands
    assert(s.activeDays == Set(0, 2, 4))
    assert(s.stage == "active")
  }

  test("noisy random times stay non-active") {
    val rnd = new scala.util.Random(3)
    val times = (0 until 40).map(_ => monday + (rnd.nextDouble() * 35 * day).toLong).sorted
    val s = Freshness.inferSchedule(times)
    // a scattered history must not be classified as an active schedule
    assert(s.forall(_.stage != "active") || s.exists(_.confidence < 0.9))
  }

  test("short histories yield no schedule") {
    assert(Freshness.inferSchedule(weekdayDaily(2)).isEmpty)
  }

  test("deadline lands on the next active day after window end + buffer") {
    val Some(s) = Freshness.inferSchedule(weekdayDaily(5))
    // last update: Friday of week 5 at 07:00; window end 7.0, buffer 3h
    val lastUpdate = weekdayDaily(5).max
    val Some(mins) = Freshness.minutesToNextDeadline(lastUpdate, s, bufferHours = 3.0)
    // next active day is Monday, deadline 10:00 → Fri 07:00 + 3d3h wall
    assert(mins == (3 * 24 + 3) * 60.0)
    // with weekend exclusion, Sat+Sun minutes drop out
    val Some(biz) = Freshness.minutesToNextDeadline(lastUpdate, s, bufferHours = 3.0,
      excludeWeekends = true)
    assert(biz == (24 + 3) * 60.0)
    // no window ⇒ no deadline
    assert(Freshness.minutesToNextDeadline(lastUpdate,
      s.copy(windowEnd = None), 3.0).isEmpty)
  }

  test("a UTC+10 series' weekend boundaries shift with the timezone") {
    val tz10 = 10 * hour
    // Thursday 20:00 UTC -> Friday 20:00 UTC: no UTC weekend touched
    val thu2000 = monday + 3 * day + 20 * hour
    val fri2000 = thu2000 + day
    assert(Freshness.excludedMinutes(thu2000, fri2000, Set.empty,
      excludeWeekends = true) == 0.0)
    // the same instants in UTC+10 are Friday 06:00 -> Saturday 06:00
    // local: six hours (Sat 00:00-06:00) fall on the local weekend
    assert(Freshness.excludedMinutes(thu2000, fri2000, Set.empty,
      tzOffsetSec = tz10, excludeWeekends = true) == 360.0)
  }

  test("UTC+10 business-minute thresholds match hand-computed gaps") {
    val tz10 = 10 * hour
    // Mon-Fri updates at 20:00 UTC for 3 weeks
    val times = for { w <- 0 until 3; d <- 0 until 5 }
      yield monday + (w * 7L + d) * day + 20 * hour
    // UTC: every business gap is 24h (the Fri->Mon 72h gap loses the
    // 48h UTC weekend) -> upper = 1440 * 1.25 floor
    val utc = Freshness.gapThreshold(times, "medium", excludeWeekends = true)
    assert(utc.upper == 1440 * 1.25)
    // UTC+10: updates land Tue-Sat 06:00 LOCAL. Thu->Fri gap crosses
    // into local Saturday (360 min excluded -> 1080); Fri->Mon spans
    // Sat 06:00 -> Tue 06:00 local, excluding Sat 18h + Sun 24h
    // -> 72h - 42h = 1800 min. Max gap 1800 * 1.25 = 2250.
    val local = Freshness.gapThreshold(times, "medium",
      excludeWeekends = true, tzOffsetSec = tz10)
    assert(local.upper == 1800 * 1.25, local.toString)
  }
}
