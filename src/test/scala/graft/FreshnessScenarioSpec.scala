package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Freshness

/** Freshness monitor SCENARIO parity — a Scala port of the reference's
  * scenario harness (tests/unit/common/conftest.py:41-212 `_run_scenario`
  * + `_evaluate_freshness_point` + the `_make_observations` /
  * `_weekday_updates` generators) driving the same scenarios as
  * tests/unit/common/test_freshness_scenarios.py, with the reference's
  * asserted outcomes transcribed per test.
  *
  * The harness iterates the observation rows, calling the ported
  * compute_freshness_threshold on the PRIOR history at each step
  * (min_lookback=30, medium sensitivity) and classifying each point
  * exactly as the reference's 3-branch evaluator does:
  * -1 training, 1 passed, 0 failed.
  *
  * Timezone note: the reference's "excl" variants run tz=America/New_York
  * over naive local timestamps; here the same local calendar runs at
  * tzOffset 0, which preserves every weekday/weekend relationship the
  * scenarios assert (2025-10-06 is a Monday in both).
  */
class FreshnessScenarioSpec extends AnyFunSuite {

  private val Hour = 3600L
  private val Day = 86400L

  private def t(y: Int, m: Int, d: Int, h: Int = 0): Long =
    java.time.LocalDateTime.of(y, m, d, h, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC)

  /** conftest._weekday_updates: updates at `hourOfDay` on weekdays in
    * [start, end], minus the skipped calendar days. */
  private def weekdayUpdates(hourOfDay: Int, start: Long, end: Long,
                             skipDays: Set[Long] = Set.empty): Set[Long] = {
    val out = Set.newBuilder[Long]
    var dayStart = math.floorDiv(start, Day) * Day
    while (dayStart <= end) {
      val up = dayStart + hourOfDay * Hour
      if (Freshness.weekday(dayStart) < 5 && !skipDays.contains(dayStart) &&
        up >= start && up <= end) out += up
      dayStart += Day
    }
    out.result()
  }

  /** conftest._make_observations: walk [start, end] at the observation
    * interval; update instants emit 0, later rows emit minutes since the
    * last update; rows before the first update are skipped. */
  private def makeObservations(start: Long, end: Long, intervalHours: Double,
                               updates: Set[Long]): Seq[(Long, Double)] = {
    val rows = Seq.newBuilder[(Long, Double)]
    var last: Option[Long] = None
    var current = start
    while (current <= end) {
      if (updates.contains(current)) { rows += ((current, 0.0)); last = Some(current) }
      else last.foreach(l => rows += ((current, ((current - l) / 60).toDouble)))
      current += (intervalHours * Hour).toLong
    }
    rows.result()
  }

  final case class Point(ts: Long, value: Double, lower: Option[Double],
                         upper: Option[Double], staleness: Option[Double],
                         schedule: Option[Freshness.Schedule], code: Int)

  /** conftest._evaluate_freshness_point: the 3-branch decision. */
  private def evaluate(ts: Long, value: Double, r: Freshness.FreshnessResult,
                       last: Option[Long], excludeWeekends: Boolean): Int = {
    val sp = Freshness.scheduleParams(r.schedule)
    val hasExcl = excludeWeekends || sp.excludedDays.nonEmpty || sp.windowStart.isDefined
    def excludedIn(a: Long, b: Long): Double =
      Freshness.excludedMinutes(a, b, sp.excludedDays,
        excludeWeekends = excludeWeekends,
        windowStart = sp.windowStart, windowEnd = sp.windowEnd)
    if (r.upper.isEmpty) -1 // training
    else if (value == 0 && last.isDefined) {
      // update point: completed gap vs [lower, upper]
      var gap = (ts - last.get) / 60.0
      if (hasExcl) gap = math.max(gap - excludedIn(last.get, ts), 0)
      if (r.lower.exists(gap < _) || gap > r.upper.get) 0 else 1
    } else if (value > 0) {
      // between updates: growing interval vs staleness (upper fallback)
      if (hasExcl && Freshness.isExcludedDay(ts, excludeWeekends,
        Set.empty, sp.excludedDays)) 1
      else {
        val excl =
          if (hasExcl && last.isDefined) excludedIn(last.get, ts) else 0.0
        if (value - excl > r.staleness.orElse(r.upper).get) 0 else 1
      }
    } else 1 // first update point
  }

  /** conftest._run_scenario with min_lookback=30. */
  private def runScenario(rows: Seq[(Long, Double)], sensitivity: String,
                          excludeWeekends: Boolean,
                          withSchedule: Boolean = false): Seq[Point] = {
    var last: Option[Long] = None
    rows.zipWithIndex.map { case ((ts, v), i) =>
      val r = Freshness.computeFreshnessThreshold(rows.take(i), sensitivity,
        minLookback = 30, excludeWeekends = excludeWeekends,
        inferScheduleEnabled = withSchedule)
      val code = evaluate(ts, v, r, last, excludeWeekends)
      if (v == 0) last = Some(ts)
      Point(ts, v, r.lower, r.upper, r.staleness, r.schedule, code)
    }
  }

  // ── Scenario 1: Daily Regular (conftest._gen_daily_regular:
  //    weekday 07:00 updates, 2025-10-06 .. 2025-11-09, 12h obs) ──────
  private def genDailyRegular(): Seq[(Long, Double)] = {
    val start = t(2025, 10, 6, 7); val end = t(2025, 11, 9, 19)
    makeObservations(start, end, 12, weekdayUpdates(7, start, end))
  }

  // ── Scenario 2a: Daily Late, gap phase (outage Wed Oct 29 - Fri
  //    Oct 31; recovery Mon Nov 3 07:00) ──────────────────────────────
  private def genDailyLateGapPhase(): Seq[(Long, Double)] = {
    val start = t(2025, 10, 6, 7); val end = t(2025, 11, 16, 19)
    val skip = Set(t(2025, 10, 29), t(2025, 10, 30), t(2025, 10, 31))
    makeObservations(start, end, 12, weekdayUpdates(7, start, end, skip))
  }

  private def updatesOf(ps: Seq[Point]) = ps.filter(_.value == 0)
  private def anomaliesOf(ps: Seq[Point]) = ps.filter(_.code == 0)

  /** test_freshness_scenarios.py:67-74 (Test_DailyRegular
    * .test_training_exits): training ends; with min_lookback=30 over 12h
    * observations the first thresholded update lands between update 6
    * and 16. */
  test("daily regular: training exits between update 6 and 16") {
    val ups = updatesOf(runScenario(genDailyRegular(), "medium",
      excludeWeekends = true))
    val firstNonTraining = ups.indexWhere(_.upper.isDefined)
    assert(firstNonTraining >= 6 && firstNonTraining <= 16,
      s"training exited at update $firstNonTraining")
  }

  /** test_freshness_scenarios.py:76-80 (test_zero_anomalies_excl /
    * _no_excl): the happy path raises NO anomaly under either
    * exclusion setting. */
  test("daily regular: zero anomalies with and without weekend exclusion") {
    assert(anomaliesOf(runScenario(genDailyRegular(), "medium",
      excludeWeekends = true)).isEmpty)
    assert(anomaliesOf(runScenario(genDailyRegular(), "medium",
      excludeWeekends = false)).isEmpty)
  }

  /** test_freshness_scenarios.py:82-86
    * (test_thresholds_present_after_training). */
  test("daily regular: all post-training thresholds are positive") {
    val post = runScenario(genDailyRegular(), "medium",
      excludeWeekends = true).filter(_.upper.isDefined)
    assert(post.nonEmpty && post.forall(_.upper.get > 0))
  }

  /** Schedule-path variant of the happy path (the reference's tz-enabled
    * fixtures): the weekday-daily feed infers an ACTIVE daily schedule
    * by the scenario end and still raises no anomaly — weekend silence
    * is absorbed by the schedule's excluded days and deadline-override
    * upper (test_freshness_scenarios.py Test_DailyRegular results_excl +
    * Test_DailyLateSchedulePhase.test_schedule_active_before_outage's
    * stage semantics). */
  test("daily regular: schedule inference turns active and stays anomaly-free") {
    val ps = runScenario(genDailyRegular(), "medium",
      excludeWeekends = true, withSchedule = true)
    assert(anomaliesOf(ps).isEmpty)
    val lastSched = ps.last.schedule
    assert(lastSched.exists(_.stage == "active"), s"schedule: $lastSched")
    assert(lastSched.exists(_.frequency == "daily"))
    assert(lastSched.exists(_.activeDays == Set(0, 1, 2, 3, 4)))
  }

  /** test_freshness_scenarios.py:105-111 (Test_DailyLateGapPhase
    * .test_schedule_tentative_excl): at ~16 completed gaps the schedule
    * has NOT reached active. */
  test("daily late (gap phase): schedule is not yet active before the outage") {
    val outageStart = t(2025, 10, 29)
    val pre = runScenario(genDailyLateGapPhase(), "medium",
      excludeWeekends = true, withSchedule = true)
      .filter(p => p.ts < outageStart && p.schedule.isDefined)
    assert(pre.nonEmpty)
    assert(pre.last.schedule.get.stage != "active",
      s"stage: ${pre.last.schedule.get.stage}")
  }

  /** test_freshness_scenarios.py:113-125
    * (test_anomaly_detected_during_outage_excl / _no_excl): the Wed-Fri
    * outage raises an anomaly before recovery — by Mon 07:00 with
    * weekend exclusion, by Mon 19:00 without. */
  test("daily late (gap phase): the outage is detected under both settings") {
    val outageStart = t(2025, 10, 29)
    val exc = anomaliesOf(runScenario(genDailyLateGapPhase(), "medium",
      excludeWeekends = true))
      .filter(p => p.ts >= outageStart && p.ts < t(2025, 11, 3, 7))
    assert(exc.nonEmpty, "no anomaly during outage with exclusion")
    val noExc = anomaliesOf(runScenario(genDailyLateGapPhase(), "medium",
      excludeWeekends = false))
      .filter(p => p.ts >= outageStart && p.ts <= t(2025, 11, 3, 19))
    assert(noExc.nonEmpty, "no anomaly during outage without exclusion")
  }

  /** test_freshness_scenarios.py:127-141 (test_recovery_passes_excl):
    * the first recovery update completes the anomalous gap and fails;
    * the following updates pass. */
  test("daily late (gap phase): first recovery update fails, then passes resume") {
    val recovery = t(2025, 11, 3, 7)
    val post = updatesOf(runScenario(genDailyLateGapPhase(), "medium",
      excludeWeekends = true)).filter(_.ts >= recovery)
    assert(post.size >= 2)
    assert(post.head.code == 0, "outage-completing update should fail")
    assert(post.slice(1, 3).forall(_.code == 1),
      s"post-recovery updates should pass: ${post.slice(1, 3).map(_.code)}")
  }
}
