package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Freshness, TimeSeries}

/** Independent parity specs whose EXPECTED values are transcribed from
  * the reference's own unit tests — not from this engine's output — so
  * the model ports are anchored to reference-derived numbers rather
  * than self-consistency. Each test cites the reference test it
  * transcribes (paths relative to /root/reference/).
  *
  * Scenario sources:
  *  - tests/unit/common/test_time_series_service.py
  *    (Test_GetFreshnessGapThreshold, Test_CountExcludedMinutes,
  *     Test_IsExcludedDay)
  *  - tests/unit/commands/test_thresholds_prediction.py
  *    (compute_sarimax_threshold tolerance arithmetic)
  *
  * Timestamp literals are the reference's (February 2026; 2026-02-02 is
  * a Monday). The reference's tz="America/New_York" cases run in
  * February, i.e. EST = UTC-5 → tzOffsetSec = -18000.
  */
class ReferenceParitySpec extends AnyFunSuite {

  private def ts(s: String): Long =
    java.time.LocalDateTime.parse(s).toEpochSecond(java.time.ZoneOffset.UTC)

  private val EstOffset = -5 * 3600L // America/New_York in February (EST)

  private def approx(a: Double, b: Double, tol: Double = 1e-6): Boolean =
    math.abs(a - b) <= tol

  // ── Test_GetFreshnessGapThreshold ──────────────────────────────────

  /** test_time_series_service.py:24-34 (test_basic_threshold):
    * 6 updates spaced 10h apart = 5 gaps of 600 minutes; with medium
    * params (upper_percentile=95, floor_multiplier=1.25,
    * lower_percentile=10): P95 = 600, floor = 600*1.25 → upper == 750.0
    * and staleness == 600 * 0.85 == 510.0. */
  test("gap threshold basic: uniform 600-min gaps give upper 750, staleness 510") {
    val updates = Seq("2026-02-01T00:00", "2026-02-01T10:00", "2026-02-01T20:00",
      "2026-02-02T06:00", "2026-02-02T16:00", "2026-02-03T02:00").map(ts)
    val r = Freshness.gapThreshold(updates, "medium")
    assert(approx(r.upper, 750.0))
    assert(approx(r.staleness, 600.0 * 0.85))
  }

  /** test_time_series_service.py:36-42 (test_not_enough_data_few_gaps):
    * 4 updates = 3 gaps, below MIN_FRESHNESS_GAPS (5) → NotEnoughData. */
  test("gap threshold raises NotEnoughData below 5 completed gaps") {
    val updates = Seq("2026-02-01T00:00", "2026-02-01T10:00",
      "2026-02-01T20:00", "2026-02-02T06:00").map(ts)
    intercept[Freshness.NotEnoughData] {
      Freshness.gapThreshold(updates, "medium")
    }
  }

  /** test_time_series_service.py:63-80 (test_sensitivity_ordering):
    * varied gaps → high.upper <= medium.upper <= low.upper. */
  test("gap threshold sensitivity ordering high <= medium <= low") {
    val updates = Seq("2026-02-01T00:00", "2026-02-01T04:00", "2026-02-02T14:00",
      "2026-02-03T14:00", "2026-02-04T06:00", "2026-02-04T08:00",
      "2026-02-04T16:00").map(ts)
    val high = Freshness.gapThreshold(updates, "high")
    val medium = Freshness.gapThreshold(updates, "medium")
    val low = Freshness.gapThreshold(updates, "low")
    assert(high.upper <= medium.upper && medium.upper <= low.upper)
  }

  /** test_time_series_service.py:91-96
    * (test_returns_last_update_timestamp). */
  test("gap threshold returns the last update timestamp") {
    val updates = Seq("2026-02-01T00:00", "2026-02-01T10:00", "2026-02-01T20:00",
      "2026-02-02T06:00", "2026-02-02T16:00", "2026-02-03T02:00").map(ts)
    val r = Freshness.gapThreshold(updates, "medium")
    assert(r.lastUpdateSec == ts("2026-02-03T02:00"))
  }

  /** test_time_series_service.py:98-116 (test_lower_threshold): gaps
    * 240/2040/1440/960/120/480 min (the reference's own comment values);
    * with lower_percentile=10, lower is set, > 0, and < upper. The
    * exact P10 of the reference-documented gap list under numpy linear
    * interpolation is 180.0; P95 is 1890 but the 1.25 floor on the
    * 2040-min max dominates → upper == 2550.0. */
  test("gap threshold lower bound: varied gaps give lower 180 < upper 2550") {
    val updates = Seq("2026-02-01T00:00", "2026-02-01T04:00", "2026-02-02T14:00",
      "2026-02-03T14:00", "2026-02-04T06:00", "2026-02-04T08:00",
      "2026-02-04T16:00").map(ts)
    val r = Freshness.gapThreshold(updates, "medium")
    assert(r.lower.isDefined && r.lower.get > 0 && r.lower.get < r.upper)
    assert(approx(r.lower.get, 180.0))
    assert(approx(r.upper, 2040.0 * 1.25))
  }

  /** test_time_series_service.py:140-165 (test_weekend_gaps_normalized):
    * weekday-daily updates with a 72h weekend gap; with weekend
    * exclusion every gap normalizes to ~24h so the threshold drops. */
  test("weekend exclusion lowers the gap threshold vs raw gaps") {
    val updates = Seq("2026-02-02T08:00", "2026-02-03T08:00", "2026-02-04T08:00",
      "2026-02-05T08:00", "2026-02-06T08:00", "2026-02-09T08:00",
      "2026-02-10T08:00").map(ts)
    val raw = Freshness.gapThreshold(updates, "medium")
    val normalized = Freshness.gapThreshold(updates, "medium", excludeWeekends = true)
    assert(normalized.upper < raw.upper)
  }

  // ── Test_CountExcludedMinutes ──────────────────────────────────────

  /** test_time_series_service.py:196-200 (test_no_exclusions). */
  test("excluded minutes: no exclusions is 0") {
    assert(Freshness.excludedMinutes(ts("2026-02-06T17:00"), ts("2026-02-09T08:00"),
      Set.empty) == 0.0)
  }

  /** test_time_series_service.py:202-207 (test_full_weekend): Friday
    * 5PM → Monday 8AM with full Sat+Sun in between = 2*24*60. */
  test("excluded minutes: full weekend is 2880") {
    assert(Freshness.excludedMinutes(ts("2026-02-06T17:00"), ts("2026-02-09T08:00"),
      Set.empty, excludeWeekends = true) == 2 * 24 * 60.0)
  }

  /** test_time_series_service.py:209-214 (test_partial_weekend_day):
    * Saturday 1AM → 11PM = 22*60. */
  test("excluded minutes: partial weekend day is 1320") {
    assert(Freshness.excludedMinutes(ts("2026-02-07T01:00"), ts("2026-02-07T23:00"),
      Set.empty, excludeWeekends = true) == 22 * 60.0)
  }

  /** test_time_series_service.py:216-221 (test_weekday_only). */
  test("excluded minutes: weekday-only interval is 0") {
    assert(Freshness.excludedMinutes(ts("2026-02-02T08:00"), ts("2026-02-04T08:00"),
      Set.empty, excludeWeekends = true) == 0.0)
  }

  /** test_time_series_service.py:223-229 (test_holiday): Monday →
    * Thursday with Wednesday a holiday = 1*24*60. */
  test("excluded minutes: single holiday is 1440") {
    assert(Freshness.excludedMinutes(ts("2026-02-02T08:00"), ts("2026-02-05T08:00"),
      Set.empty, holidays = Set("2026-02-04")) == 24 * 60.0)
  }

  /** test_time_series_service.py:231-238 (test_weekend_and_holiday):
    * Friday → Tuesday with Monday a holiday = Sat+Sun+Mon = 3*24*60. */
  test("excluded minutes: weekend plus adjacent holiday is 4320") {
    assert(Freshness.excludedMinutes(ts("2026-02-06T08:00"), ts("2026-02-10T08:00"),
      Set.empty, excludeWeekends = true, holidays = Set("2026-02-09")) == 3 * 24 * 60.0)
  }

  /** test_time_series_service.py:240-247
    * (test_holiday_on_weekend_not_double_counted): holiday on Saturday
    * counts once → still 2*24*60. */
  test("excluded minutes: holiday on a weekend is not double counted") {
    assert(Freshness.excludedMinutes(ts("2026-02-06T08:00"), ts("2026-02-09T08:00"),
      Set.empty, excludeWeekends = true, holidays = Set("2026-02-07")) == 2 * 24 * 60.0)
  }

  /** test_time_series_service.py:249-254 (test_same_excluded_day):
    * Saturday 8AM → 8PM = 12*60. */
  test("excluded minutes: interval within one excluded day is 720") {
    assert(Freshness.excludedMinutes(ts("2026-02-07T08:00"), ts("2026-02-07T20:00"),
      Set.empty, excludeWeekends = true) == 12 * 60.0)
  }

  /** test_time_series_service.py:256-261 (test_same_weekday). */
  test("excluded minutes: interval within one weekday is 0") {
    assert(Freshness.excludedMinutes(ts("2026-02-09T08:00"), ts("2026-02-09T20:00"),
      Set.empty, excludeWeekends = true) == 0.0)
  }

  /** test_time_series_service.py:271-277
    * (test_partial_start_on_excluded_day): Saturday 1AM → Monday
    * midnight = 23h Saturday + 24h Sunday. */
  test("excluded minutes: partial start on excluded day is 2820") {
    assert(Freshness.excludedMinutes(ts("2026-02-07T01:00"), ts("2026-02-09T00:00"),
      Set.empty, excludeWeekends = true) == (23 + 24) * 60.0)
  }

  /** test_time_series_service.py:279-288 (test_start_equals_end,
    * test_start_after_end). */
  test("excluded minutes: empty or inverted interval is 0") {
    val t = ts("2026-02-07T08:00")
    assert(Freshness.excludedMinutes(t, t, Set.empty, excludeWeekends = true) == 0.0)
    assert(Freshness.excludedMinutes(ts("2026-02-08T08:00"), ts("2026-02-07T08:00"),
      Set.empty, excludeWeekends = true) == 0.0)
  }

  /** test_time_series_service.py:290-305
    * (test_timezone_shifts_weekend_boundaries): UTC Fri 23:00 → Mon
    * 01:00 is 2 full UTC weekend days (2880), but in EST the same
    * interval covers full ET Saturday + 20h of ET Sunday = 44*60. */
  test("excluded minutes: timezone shifts weekend boundaries (2880 UTC vs 2640 EST)") {
    val start = ts("2026-02-06T23:00")
    val end = ts("2026-02-09T01:00")
    val utc = Freshness.excludedMinutes(start, end, Set.empty, excludeWeekends = true)
    val est = Freshness.excludedMinutes(start, end, Set.empty,
      tzOffsetSec = EstOffset, excludeWeekends = true)
    assert(utc == 2 * 24 * 60.0)
    assert(est != utc)
    assert(est == 44 * 60.0)
  }

  // ── Test_IsExcludedDay ─────────────────────────────────────────────

  /** test_time_series_service.py:309-326 (weekend/weekday/holiday
    * cases) and :328-344 (timezone conversions). */
  test("is-excluded-day matches the reference's weekend/holiday/timezone cases") {
    // Saturday / Sunday are weekend days; Monday is not.
    assert(Freshness.isExcludedDay(ts("2026-02-07T00:00"), excludeWeekends = true, Set.empty, Set.empty))
    assert(Freshness.isExcludedDay(ts("2026-02-08T00:00"), excludeWeekends = true, Set.empty, Set.empty))
    assert(!Freshness.isExcludedDay(ts("2026-02-09T00:00"), excludeWeekends = true, Set.empty, Set.empty))
    // Holiday Monday with weekends not excluded.
    assert(Freshness.isExcludedDay(ts("2026-02-09T00:00"), excludeWeekends = false,
      Set("2026-02-09"), Set.empty))
    // Mid-day timestamp on Saturday.
    assert(Freshness.isExcludedDay(ts("2026-02-07T14:00"), excludeWeekends = true, Set.empty, Set.empty))
    // No exclusions configured.
    assert(!Freshness.isExcludedDay(ts("2026-02-07T00:00"), excludeWeekends = false, Set.empty, Set.empty))
    // UTC Saturday 03:00 = Friday 10PM EST → not a weekend day in EST.
    assert(!Freshness.isExcludedDay(ts("2026-02-07T03:00"), excludeWeekends = true,
      Set.empty, Set.empty, tzOffsetSec = EstOffset))
    // UTC Saturday 15:00 = Saturday 10AM EST → weekend in EST.
    assert(Freshness.isExcludedDay(ts("2026-02-07T15:00"), excludeWeekends = true,
      Set.empty, Set.empty, tzOffsetSec = EstOffset))
    // UTC Monday 03:00 = Sunday 10PM EST → weekend in EST.
    assert(Freshness.isExcludedDay(ts("2026-02-09T03:00"), excludeWeekends = true,
      Set.empty, Set.empty, tzOffsetSec = EstOffset))
  }

  // ── compute_sarimax_threshold tolerance arithmetic ─────────────────

  /** test_thresholds_prediction.py:48-61
    * (test_medium_sensitivity_large_sample): forecast mean=100 se=10 at
    * n >= T_DISTRIBUTION_THRESHOLD, medium z=±2.5 → (75.0, 125.0). */
  test("sarimax tolerances: medium sensitivity large sample is (75, 125)") {
    val Some((lower, upper)) = TimeSeries.thresholdFromForecast(
      100.0, 10.0, TimeSeries.TDistributionThreshold, "medium")
    assert(approx(lower, 100.0 - 2.5 * 10.0))
    assert(approx(upper, 100.0 + 2.5 * 10.0))
  }

  /** test_thresholds_prediction.py:64-87 (high z=±2.0 → (80, 120); low
    * z=±3.0 → (70, 130)). */
  test("sarimax tolerances: high is (80, 120) and low is (70, 130)") {
    val Some((hl, hu)) = TimeSeries.thresholdFromForecast(
      100.0, 10.0, TimeSeries.TDistributionThreshold, "high")
    assert(approx(hl, 80.0) && approx(hu, 120.0))
    val Some((ll, lu)) = TimeSeries.thresholdFromForecast(
      100.0, 10.0, TimeSeries.TDistributionThreshold, "low")
    assert(approx(ll, 70.0) && approx(lu, 130.0))
  }

  /** test_thresholds_prediction.py:93-115
    * (test_small_sample_uses_t_distribution): at n=10 the multiplier is
    * t.ppf(norm.cdf(±2.5), df=9), strictly wider than the raw z bounds,
    * and equal to our tPpf/normCdf composition. */
  test("sarimax tolerances: small sample widens via the t-distribution") {
    val n = 10
    val Some((lower, upper)) = TimeSeries.thresholdFromForecast(100.0, 10.0, n, "medium")
    val mult = TimeSeries.tPpf(TimeSeries.normCdf(2.5), n - 1)
    assert(approx(lower, 100.0 - mult * 10.0, 1e-9))
    assert(approx(upper, 100.0 + mult * 10.0, 1e-9))
    // wider than raw z bounds (reference asserts the same inequality)
    assert(lower < 100.0 - 2.5 * 10.0)
    assert(upper > 100.0 + 2.5 * 10.0)
  }

  /** test_thresholds_prediction.py:121-144 (test_nan_mean_returns_none,
    * test_nan_se_returns_none). */
  test("sarimax tolerances: NaN mean or SE yields no thresholds") {
    assert(TimeSeries.thresholdFromForecast(Double.NaN, 10.0, 20, "medium").isEmpty)
    assert(TimeSeries.thresholdFromForecast(100.0, Double.NaN, 20, "medium").isEmpty)
  }

  /** test_thresholds_prediction.py:150-158
    * (test_not_enough_data_returns_none): NotEnoughData from the
    * forecast propagates to (None, None). */
  test("sarimax tolerances: not enough history yields None") {
    val times = (0 until 3).map(i => ts("2025-01-01T00:00") + i * 86400L)
    assert(TimeSeries.computeThreshold(times, Seq(100.0, 100.0, 100.0), "medium").isEmpty)
  }

  /** test_thresholds_prediction.py:181-185
    * (test_z_score_map_covers_all_sensitivities): every sensitivity has
    * a z-score; values are the reference's ±2/2.5/3. */
  test("z-score map covers all sensitivities with the reference values") {
    assert(TimeSeries.zScore == Map("low" -> 3.0, "medium" -> 2.5, "high" -> 2.0))
  }
}
