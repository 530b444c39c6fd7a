package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TimeSeries

/** Unit tests for the SARIMAX threshold port, in the reference's
  * constructed-history style (reference:
  * tests/unit/common/test_time_series_service.py). */
class TimeSeriesSpec extends AnyFunSuite {
  private val day = 86400L

  test("frequency inference snaps to days, hours, and minutes") {
    val daily = (0 until 30).map(i => i * day)
    assert(TimeSeries.inferFrequencySeconds(daily) == day)
    // 2-day cadence
    val biDaily = (0 until 30).map(i => i * 2 * day)
    assert(TimeSeries.inferFrequencySeconds(biDaily) == 2 * day)
    // hourly with a little jitter (< 5%)
    val hourly = (0 until 50).map(i => i * 3600L + (i % 3) * 60L)
    assert(TimeSeries.inferFrequencySeconds(hourly) == 3600L)
    // 90-second cadence falls through to minutes
    val sec90 = (0 until 30).map(i => i * 90L)
    assert(TimeSeries.inferFrequencySeconds(sec90) == 60L)
  }

  test("resample fills gaps by linear interpolation") {
    val ts = Seq(0L, day, 4 * day)
    val vals = Seq(10.0, 20.0, 50.0)
    val (grid, y) = TimeSeries.resampleInterpolate(ts, vals, day)
    assert(grid == Seq(0L, day, 2 * day, 3 * day, 4 * day))
    assert(y.toSeq == Seq(10.0, 20.0, 30.0, 40.0, 50.0))
  }

  test("normal CDF matches the reference approximation") {
    assert(math.abs(TimeSeries.normCdf(0.0) - 0.5) < 1e-7)
    assert(math.abs(TimeSeries.normCdf(2.0) - 0.9772) < 1e-4)
    assert(math.abs(TimeSeries.normCdf(-2.5) - 0.0062) < 1e-4)
  }

  test("t quantile widens small-sample tolerances and converges to z") {
    val p = TimeSeries.normCdf(2.0)
    val t10 = TimeSeries.tPpf(p, 10)
    val t1000 = TimeSeries.tPpf(p, 1000)
    assert(t10 > 2.0) // fat tails widen the band
    assert(t10 < 3.0)
    assert(math.abs(t1000 - 2.0) < 0.02)
    // scipy reference: t.ppf(norm.cdf(2), 19) ≈ 2.1398
    assert(math.abs(TimeSeries.tPpf(p, 19) - 2.1398) < 0.01)
  }

  test("weekend flag matches the calendar") {
    // 2026-08-01 was a Saturday
    val sat = java.time.LocalDate.of(2026, 8, 1).toEpochDay * day
    assert(TimeSeries.isWeekend(sat) == 1)
    assert(TimeSeries.isWeekend(sat + 2 * day) == 0) // Monday
  }

  test("holiday calendar flags exog like weekends") {
    // 1970-01-01 (Thursday) as a holiday: excluded even though a weekday
    assert(TimeSeries.isExcluded(0L, excludeWeekends = false, 0L, Set("1970-01-01")) == 1.0)
    assert(TimeSeries.isExcluded(0L, excludeWeekends = false, 0L, Set.empty) == 0.0)
    assert(TimeSeries.localDate(0L) == "1970-01-01")
    // weekend flag still applies with a calendar present
    assert(TimeSeries.isExcluded(2 * day, excludeWeekends = true, 0L, Set("1999-01-01")) == 1.0)
  }

  test("holiday exog changes the fit when history dips on the holiday") {
    // 30 daily points: value 100, except a dip to 40 on day 10 (the "holiday")
    val ts = (0 until 30).map(i => i * day)
    val vals = (0 until 30).map(i => if (i == 10) 40.0 else 100.0 + (i % 3) * 0.5)
    val holiday = TimeSeries.localDate(10 * day)
    val withCal = TimeSeries.sarimaxForecast(ts, vals, holidays = Set(holiday))
    val without = TimeSeries.sarimaxForecast(ts, vals)
    // the exogenous regressor absorbs the dip, so the models differ and
    // the calendar-aware forecast stays near the weekday level
    assert(withCal.mean(0) != without.mean(0) || withCal.se(0) != without.se(0))
    assert(math.abs(withCal.mean(0) - 100.0) < 15.0)
    assert(withCal.se.forall(s => s.isFinite && s >= 0))
  }

  test("US federal calendar computes fixed, floating, and observed dates") {
    import graft.streaming.HolidayCalendar
    val c2026 = HolidayCalendar.usFederal(2026).map(_.toString)
    assert(c2026.contains("2026-01-01")) // New Year's Day
    assert(c2026.contains("2026-01-19")) // MLK Day: 3rd Monday of January
    assert(c2026.contains("2026-11-26")) // Thanksgiving: 4th Thursday of November
    // Independence Day 2026 is a Saturday: actual AND observed Friday
    assert(c2026.contains("2026-07-04") && c2026.contains("2026-07-03"))
    // Juneteenth exists only from 2021 (and 2021-06-19 is a Saturday)
    assert(!HolidayCalendar.usFederal(2020).exists(_.toString == "2020-06-19"))
    assert(HolidayCalendar.usFederal(2021).exists(_.toString == "2021-06-19"))
    assert(HolidayCalendar.usFederal(2021).exists(_.toString == "2021-06-18"))
    assert(HolidayCalendar.dates(Seq("US"), 2025 to 2025).contains("2025-05-26")) // Memorial
    // unresolved codes contribute nothing (reference warns and skips)
    assert(HolidayCalendar.dates(Seq("XX"), 2025 to 2025).isEmpty)
  }

  test("holiday-flagged point breaches without the exog and not with it") {
    import graft.streaming.HolidayCalendar
    // Daily series 2025-05-01 .. 2025-07-03 at level 100, dipping to 20
    // on the in-range holidays (Memorial Day 5/26, Juneteenth 6/19). The
    // NEXT point is Independence Day 2025-07-04, also valued 20.
    val holidays = HolidayCalendar.dates(Seq("US"), 2025 to 2025)
    val start = java.time.LocalDate.parse("2025-05-01").toEpochDay * day
    val ts = (0 until 64).map(i => start + i * day)
    val vals = ts.map(t =>
      if (holidays.contains(TimeSeries.localDate(t))) 20.0 else 100.0)
    assert(vals.count(_ == 20.0) == 2)
    val holidayValue = 20.0
    val Some((loPlain, _)) = TimeSeries.computeThreshold(ts, vals, "medium")
    val Some((loCal, hiCal)) =
      TimeSeries.computeThreshold(ts, vals, "medium", holidays = holidays)
    // without the exog the model forecasts the weekday level — the
    // holiday's dip breaches the lower tolerance
    assert(holidayValue < loPlain, s"expected breach: $holidayValue vs $loPlain")
    // with the exog the regressor shifts the holiday forecast down — in band
    assert(loCal <= holidayValue && holidayValue <= hiCal,
      s"expected in-band: [$loCal, $hiCal]")
  }

  test("timezone shifts the weekend exog flags exactly as the reference asserts") {
    // Port of Test_GetSarimaxForecast_TimezoneExog
    // (test_time_series_service.py:595-634): daily history at 03:00 UTC,
    // which is 22:00 the PREVIOUS day at UTC-5 — so UTC-Saturday 03:00
    // is a Friday evening in ET and the weekend exog flags move.
    // Deviation noted: the reference draws rng(42) noise and models tz
    // by name; the properties are noise-independent and the port takes
    // a fixed offset, so a deterministic wiggle + -5 h offset exercises
    // the same Jan/Feb EST calendar.
    val start = java.time.LocalDateTime.of(2026, 1, 5, 3, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC)
    val ts = (0 until 40).map(i => start + i.toLong * day)
    val vals = ts.indices.map(i => 100.0 + i + 5.0 * math.sin(i * 1.7))
    val etOffset = -5L * 3600

    // tz changes weekend flags -> the forecasts differ (:609-621)
    val utc = TimeSeries.sarimaxForecast(ts, vals, excludeWeekends = true)
    val et = TimeSeries.sarimaxForecast(ts, vals, excludeWeekends = true,
      tzOffsetSec = etOffset)
    assert(!utc.mean.sameElements(et.mean),
      "tz offset did not move the weekend exog flags")
    // the flags themselves: UTC Sat 03:00 is excluded in UTC, not in ET
    val sat = java.time.LocalDateTime.of(2026, 1, 10, 3, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC)
    assert(TimeSeries.isExcluded(sat, true, 0L, Set.empty) == 1.0)
    assert(TimeSeries.isExcluded(sat, true, etOffset, Set.empty) == 0.0)

    // absent tz == explicit zero offset (:623-626)
    val none = TimeSeries.sarimaxForecast(ts, vals, excludeWeekends = true)
    assert(utc.mean.sameElements(none.mean) && utc.se.sameElements(none.se))

    // without exclusions the tz has no effect (:628-634)
    val plain = TimeSeries.sarimaxForecast(ts, vals)
    val plainTz = TimeSeries.sarimaxForecast(ts, vals, tzOffsetSec = etOffset)
    assert(plain.mean.sameElements(plainTz.mean) &&
      plain.se.sameElements(plainTz.se))
  }

  test("forecast on a flat noisy series stays near the level with sane SE") {
    val rnd = new scala.util.Random(7)
    val ts = (0 until 60).map(i => i * day)
    val vals = ts.map(_ => 100.0 + rnd.nextGaussian() * 3.0)
    val fc = TimeSeries.sarimaxForecast(ts, vals)
    assert(fc.mean.forall(m => math.abs(m - 100.0) < 15.0))
    // SE floor: at least the raw first-difference sd (≈ 3√2)
    assert(fc.se.forall(_ >= 3.0))
    assert(fc.se.forall(_ <= 30.0))
    // model SE is non-decreasing with horizon once the floor is cleared
    assert(fc.se.last >= fc.se.head - 1e-9)
  }

  test("forecast tracks a linear trend") {
    val ts = (0 until 40).map(i => i * day)
    val vals = ts.indices.map(i => 10.0 + 5.0 * i)
    val fc = TimeSeries.sarimaxForecast(ts, vals)
    // next point of a perfect +5/day trend ≈ 10 + 5*40
    assert(math.abs(fc.mean(0) - 210.0) < 10.0)
  }

  test("thresholds bracket the next value of a stable series") {
    val rnd = new scala.util.Random(11)
    val ts = (0 until 45).map(i => i * day)
    val vals = ts.map(_ => 500.0 + rnd.nextGaussian() * 10.0)
    val Some((lo, hi)) = TimeSeries.computeThreshold(ts, vals, "medium")
    assert(lo < 500.0 && 500.0 < hi)
    // low sensitivity widens, high narrows
    val Some((lo2, hi2)) = TimeSeries.computeThreshold(ts, vals, "low")
    val Some((lo3, hi3)) = TimeSeries.computeThreshold(ts, vals, "high")
    assert(lo2 <= lo && hi2 >= hi)
    assert(lo3 >= lo && hi3 <= hi)
  }

  test("too-short histories raise NotEnoughData / return None") {
    val ts = (0 until 10).map(i => i * day)
    val vals = ts.map(_ => 1.0)
    intercept[TimeSeries.NotEnoughData] {
      TimeSeries.sarimaxForecast(ts, vals)
    }
    assert(TimeSeries.computeThreshold(ts, vals, "medium").isEmpty)
  }
}
