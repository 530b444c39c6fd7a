package graft.streaming

/** Freshness gap thresholds + update-schedule inference — a Scala port
  * of the reference's freshness service (reference:
  * testgen/common/freshness_service.py:16-113 gap thresholds,
  * :369-566 frequency classification / active-day detection /
  * update-window detection / confidence / schedule inference;
  * sensitivity parameter map at
  * testgen/commands/test_thresholds_prediction.py:44-61).
  *
  * All arithmetic is over a table's update-event history — a small
  * driver/executor-side array per monitored table — so the port is pure
  * Scala; the distributed part (extracting per-table update times) is
  * ordinary aggregation. Percentiles use numpy's linear interpolation
  * to match the reference's np.percentile.
  *
  * Business-minute exclusions are ported in full: weekends, inferred
  * inactive days, holiday calendars (resolved through
  * [[HolidayCalendar]], the reference's holiday_codes path), and the
  * time-of-day update-window exclusion on otherwise-active days
  * (count_excluded_minutes, freshness_service.py:283-312) — so a
  * 9-to-5 table's overnight hours no longer inflate its gap
  * distribution or thresholds.
  */
object Freshness {

  val MinFreshnessGaps = 5
  val MaxFreshnessGaps = 40

  /** (upper_percentile, floor_multiplier, lower_percentile) by
    * sensitivity (FRESHNESS_THRESHOLD_MAP). */
  val thresholdParams: Map[String, (Double, Double, Double)] = Map(
    "high" -> ((80.0, 1.0, 20.0)),
    "medium" -> ((95.0, 1.25, 10.0)),
    "low" -> ((99.0, 1.5, 5.0)))

  /** Staleness factor by sensitivity (STALENESS_FACTOR_MAP). */
  val stalenessFactor: Map[String, Double] =
    Map("high" -> 0.75, "medium" -> 0.85, "low" -> 0.95)

  /** Deadline buffer hours by sensitivity
    * (SCHEDULE_DEADLINE_BUFFER_HOURS,
    * test_thresholds_prediction.py:51-55). */
  val deadlineBufferHours: Map[String, Double] =
    Map("high" -> 1.5, "medium" -> 3.0, "low" -> 5.0)

  final case class Threshold(lower: Option[Double], upper: Double,
                             staleness: Double, lastUpdateSec: Long)

  final case class Schedule(stage: String, frequency: String,
                            activeDays: Set[Int], windowStart: Option[Double],
                            windowEnd: Option[Double], confidence: Double,
                            numEvents: Int)

  final class NotEnoughData(msg: String) extends IllegalArgumentException(msg)

  /** np.percentile with linear interpolation. */
  def percentile(values: Seq[Double], p: Double): Double = {
    val a = values.sorted
    val rank = p / 100.0 * (a.length - 1)
    val lo = math.floor(rank).toInt
    val hi = math.ceil(rank).toInt
    if (lo == hi) a(lo) else a(lo) + (rank - lo) * (a(hi) - a(lo))
  }

  private def median(values: Seq[Double]): Double = percentile(values, 50.0)

  /** Weekday 0=Mon..6=Sun of an epoch-seconds instant (+tz offset). */
  def weekday(tsSec: Long, tzOffsetSec: Long = 0L): Int = {
    val days = math.floorDiv(tsSec + tzOffsetSec, 86400L)
    (((days + 3) % 7 + 7) % 7).toInt
  }

  /** Local calendar date of an instant as "yyyy-MM-dd" (holiday keys). */
  private def localDate(tsSec: Long, tzOffsetSec: Long): String =
    java.time.LocalDate.ofEpochDay(math.floorDiv(tsSec + tzOffsetSec, 86400L)).toString

  /** is_excluded_day (freshness_service.py:146-185, day-level part):
    * weekend, inferred inactive day, or holiday. */
  def isExcludedDay(tsSec: Long, excludeWeekends: Boolean,
                    holidays: Set[String], excludedDays: Set[Int],
                    tzOffsetSec: Long = 0L): Boolean = {
    val dow = weekday(tsSec, tzOffsetSec)
    (excludeWeekends && dow >= 5) ||
      excludedDays.contains(dow) ||
      (holidays.nonEmpty && holidays.contains(localDate(tsSec, tzOffsetSec)))
  }

  /** Full port of count_excluded_minutes
    * (freshness_service.py:218-292): minutes of [startSec, endSec)
    * falling on excluded days (weekends / holidays / inactive days,
    * whole-day overlap, partial boundary days prorated) plus — on
    * otherwise-ACTIVE days when a sub-daily update window is known —
    * the hours outside [windowStart, windowEnd]. */
  def excludedMinutes(startSec: Long, endSec: Long, excludedDays: Set[Int],
                      tzOffsetSec: Long = 0L,
                      excludeWeekends: Boolean = false,
                      holidays: Set[String] = Set.empty,
                      windowStart: Option[Double] = None,
                      windowEnd: Option[Double] = None): Double = {
    if (endSec <= startSec) return 0.0
    val hasWindow = windowStart.isDefined && windowEnd.isDefined
    if (excludedDays.isEmpty && !excludeWeekends && holidays.isEmpty && !hasWindow)
      return 0.0
    var total = 0.0
    var dayStart = math.floorDiv(startSec + tzOffsetSec, 86400L) * 86400L - tzOffsetSec
    while (dayStart < endSec) {
      val dayEnd = dayStart + 86400L
      val overlapStart = math.max(startSec, dayStart)
      val overlapEnd = math.min(endSec, dayEnd)
      if (isExcludedDay(dayStart, excludeWeekends, holidays, excludedDays, tzOffsetSec)) {
        // full day excluded — count the whole overlap
        if (overlapEnd > overlapStart) total += (overlapEnd - overlapStart) / 60.0
      } else if (hasWindow) {
        // active day with a window: excluded = overlap minus time inside
        // the [windowStart, windowEnd] active hours of this calendar day
        val winOpen = dayStart + (windowStart.get * 3600).toLong
        val winClose = dayStart + (windowEnd.get * 3600).toLong
        val totalOverlap = math.max(overlapEnd - overlapStart, 0L) / 60.0
        val activeStart = math.max(overlapStart, winOpen)
        val activeEnd = math.min(overlapEnd, winClose)
        val activeMinutes = math.max(activeEnd - activeStart, 0L) / 60.0
        val excludedOnDay = totalOverlap - activeMinutes
        if (excludedOnDay > 0) total += excludedOnDay
      }
      dayStart = dayEnd
    }
    total
  }

  /** Schedule-derived exclusion parameters (get_schedule_params,
    * freshness_service.py:124-144): only an ACTIVE schedule contributes;
    * inactive inferred days become excluded days, and the time-of-day
    * window applies only to sub-daily schedules. */
  final case class ScheduleParams(excludedDays: Set[Int],
                                  windowStart: Option[Double],
                                  windowEnd: Option[Double])

  def scheduleParams(sched: Option[Schedule]): ScheduleParams = sched match {
    case Some(s) if s.stage == "active" =>
      val excl =
        if (s.activeDays.nonEmpty) (0 until 7).toSet -- s.activeDays
        else Set.empty[Int]
      val (ws, we) =
        if (s.frequency == "sub_daily") (s.windowStart, s.windowEnd)
        else (None, None)
      ScheduleParams(excl, ws, we)
    case _ => ScheduleParams(Set.empty, None, None)
  }

  /** get_freshness_gap_threshold over update-event times (epoch sec).
    * Gap durations are normalized by subtracting excluded time —
    * weekends, holidays (business calendar), inferred inactive days, and
    * hours outside the detected update window on active days
    * (freshness_service.py:39-120). */
  def gapThreshold(updateTimesSec: Seq[Long], sensitivity: String,
                   excludeWeekends: Boolean = false,
                   excludedDays: Set[Int] = Set.empty,
                   tzOffsetSec: Long = 0L,
                   holidays: Set[String] = Set.empty,
                   windowStart: Option[Double] = None,
                   windowEnd: Option[Double] = None): Threshold = {
    val times = updateTimesSec.sorted
    if (times.length - 1 < MinFreshnessGaps)
      throw new NotEnoughData(
        s"Need at least $MinFreshnessGaps completed gaps, found ${math.max(times.length - 1, 0)}.")
    val (upperPct, floorMult, lowerPct) = thresholdParams(sensitivity)
    val hasExclusions = excludeWeekends || excludedDays.nonEmpty ||
      holidays.nonEmpty || (windowStart.isDefined && windowEnd.isDefined)
    var gaps = times.sliding(2).map { case Seq(a, b) =>
      val raw = (b - a) / 60.0
      if (hasExclusions)
        math.max(raw - excludedMinutes(a, b, excludedDays, tzOffsetSec,
          excludeWeekends, holidays, windowStart, windowEnd), 0.0)
      else raw
    }.toSeq
    if (gaps.length > MaxFreshnessGaps) gaps = gaps.takeRight(MaxFreshnessGaps)
    val upper = math.max(percentile(gaps, upperPct), gaps.max * floorMult)
    val lowerRaw = percentile(gaps, lowerPct)
    Threshold(
      lower = if (lowerRaw <= 0) None else Some(lowerRaw),
      upper = upper,
      staleness = median(gaps) * stalenessFactor(sensitivity),
      lastUpdateSec = times.last)
  }

  /** classify_frequency over gaps in hours. */
  def classifyFrequency(gapsHours: Seq[Double]): String = {
    if (gapsHours.isEmpty) return "irregular"
    val m = median(gapsHours)
    if (m < 6) "sub_daily"
    else if (m < 36) "daily"
    else if (m > 120 && m < 240) "weekly"
    else "irregular"
  }

  /** detect_active_days: weekdays whose per-week hit rate >= 0.5. */
  def detectActiveDays(timesSec: Seq[Long], tzOffsetSec: Long = 0L,
                       minWeeks: Int = 3): Option[Set[Int]] = {
    if (timesSec.length < 2) return None
    val rangeDays = (timesSec.last - timesSec.head) / 86400L
    if (rangeDays < minWeeks * 7L) return None
    val weeksObserved = math.max(1L, rangeDays / 7L).toDouble
    val counts = timesSec.groupBy(t => weekday(t, tzOffsetSec)).view.mapValues(_.size)
    val active = (0 until 7).filter(d => counts.getOrElse(d, 0) / weeksObserved >= 0.5).toSet
    if (active.nonEmpty) Some(active) else None
  }

  private def hourOf(tsSec: Long, tzOffsetSec: Long): Double = {
    val secOfDay = math.floorMod(tsSec + tzOffsetSec, 86400L)
    (secOfDay / 3600) + ((secOfDay % 3600) / 60) / 60.0
  }

  /** detect_update_window: P10–P90 time-of-day window on active days,
    * with the midnight-wrapping shift. */
  def detectUpdateWindow(timesSec: Seq[Long], activeDays: Set[Int],
                         tzOffsetSec: Long = 0L): Option[(Double, Double)] = {
    var hours = timesSec
      .filter(t => activeDays.contains(weekday(t, tzOffsetSec)))
      .map(t => hourOf(t, tzOffsetSec))
    if (hours.length < 10) return None
    val late = hours.count(_ >= 22).toDouble / hours.length
    val early = hours.count(_ < 3).toDouble / hours.length
    val shifted = late > 0.25 && early > 0.25
    if (shifted) hours = hours.map(h => (h + 12) % 24)
    var p10 = percentile(hours, 10)
    var p90 = percentile(hours, 90)
    if (shifted) {
      p10 = ((p10 - 12) % 24 + 24) % 24
      p90 = ((p90 - 12) % 24 + 24) % 24
    }
    Some((p10, p90))
  }

  private def inWindow(hour: Double, start: Double, end: Double): Boolean =
    if (start <= end) hour >= start && hour <= end
    else hour >= start || hour <= end

  /** compute_schedule_confidence: fraction of updates matching the
    * active days + time window. */
  def confidence(timesSec: Seq[Long], activeDays: Set[Int],
                 window: Option[(Double, Double)], tzOffsetSec: Long = 0L): Double = {
    if (timesSec.isEmpty) return 0.0
    val matching = timesSec.count { t =>
      activeDays.contains(weekday(t, tzOffsetSec)) &&
        window.forall { case (s, e) => inWindow(hourOf(t, tzOffsetSec), s, e) }
    }
    matching.toDouble / timesSec.length
  }

  /** minutes_to_next_deadline (freshness_service.py:567-608): wall (or
    * business) minutes from the last update to the next active-day
    * deadline — the threshold path for non-sub-daily schedules. The
    * deadline is window_end + buffer on the next active day. */
  def minutesToNextDeadline(lastUpdateSec: Long, schedule: Schedule,
                            bufferHours: Double,
                            excludeWeekends: Boolean = false,
                            excludedDays: Set[Int] = Set.empty,
                            tzOffsetSec: Long = 0L,
                            holidays: Set[String] = Set.empty): Option[Double] = {
    schedule.windowEnd.flatMap { we =>
      val deadlineHour = (we + bufferHours) % 24
      def dayStartOf(t: Long): Long =
        math.floorDiv(t + tzOffsetSec, 86400L) * 86400L - tzOffsetSec
      def nextActiveDay(fromDayStart: Long): Option[Long] =
        (0 until 14).map(i => fromDayStart + i * 86400L)
          .find(d => schedule.activeDays.contains(weekday(d, tzOffsetSec)))
      def deadlineOn(dayStart: Long): Long = dayStart + (deadlineHour * 3600).toLong
      val nextDay = dayStartOf(lastUpdateSec) + 86400L
      nextActiveDay(nextDay).flatMap { cand =>
        var deadline = deadlineOn(cand)
        if (deadline <= lastUpdateSec) {
          nextActiveDay(cand + 86400L) match {
            case Some(c2) => deadline = deadlineOn(c2)
            case None     => return None
          }
        }
        val wall = (deadline - lastUpdateSec) / 60.0
        if (wall <= 0) None
        else if (excludeWeekends || excludedDays.nonEmpty || holidays.nonEmpty)
          Some(math.max(wall - excludedMinutes(lastUpdateSec, deadline,
            excludedDays, tzOffsetSec, excludeWeekends, holidays), 0))
        else Some(wall)
      }
    }
  }

  /** Full threshold result of [[computeFreshnessThreshold]] — the
    * reference's (lower, upper, staleness, prediction) 4-tuple with the
    * inferred schedule riding along as the prediction payload. */
  final case class FreshnessResult(lower: Option[Double], upper: Option[Double],
                                   staleness: Option[Double],
                                   schedule: Option[Schedule])

  /** Port of compute_freshness_threshold
    * (testgen/commands/test_thresholds_prediction.py:153-260) — the
    * complete freshness orchestration over one monitored series'
    * observation history (sawtooth rows of (epoch sec, minutes since
    * last update); updates are rows with value 0):
    *
    *  1. under `minLookback` observations → training (all None);
    *  2. first-pass gap thresholds from the update gaps (weekends
    *     excluded iff the user hinted so);
    *  3. with schedule inference enabled (the reference's schedule_tz
    *     knob): an ACTIVE inferred schedule supersedes the user hint —
    *     its inactive days become the excluded days, sub-daily windows
    *     exclude overnight hours, thresholds re-fit under those
    *     exclusions (staleness only exists here), and daily/weekly
    *     schedules override `upper` with the next-deadline minutes. */
  def computeFreshnessThreshold(rows: Seq[(Long, Double)], sensitivity: String,
                                minLookback: Int = 1,
                                excludeWeekends: Boolean = false,
                                inferScheduleEnabled: Boolean = false,
                                tzOffsetSec: Long = 0L): FreshnessResult = {
    val none = FreshnessResult(None, None, None, None)
    if (rows.length < minLookback) return none
    val updates = rows.collect { case (t, v) if v == 0 => t }
    val first =
      try gapThreshold(updates, sensitivity, excludeWeekends = excludeWeekends,
        tzOffsetSec = tzOffsetSec)
      catch { case _: NotEnoughData => return none }
    var lower = first.lower
    var upper = Option(first.upper)
    var staleness: Option[Double] = None
    if (!inferScheduleEnabled)
      return FreshnessResult(lower, upper, staleness, None)

    val schedOpt = inferSchedule(updates, tzOffsetSec)
    schedOpt match {
      case Some(sched) if sched.stage == "active" =>
        val excludedDays =
          if (sched.activeDays.nonEmpty) (0 until 7).toSet -- sched.activeDays
          else Set.empty[Int]
        // an active schedule's excluded days supersede the user's
        // exclude_weekends hint (test_thresholds_prediction.py:216-219)
        val schedExclWeekends = if (excludedDays.nonEmpty) false else excludeWeekends
        val hasWindow = sched.frequency == "sub_daily" &&
          sched.windowStart.isDefined && sched.windowEnd.isDefined
        var lastUpdate = first.lastUpdateSec
        if (excludedDays.nonEmpty || hasWindow) {
          try {
            val refit = gapThreshold(updates, sensitivity,
              excludeWeekends = schedExclWeekends,
              excludedDays = excludedDays, tzOffsetSec = tzOffsetSec,
              windowStart = if (hasWindow) sched.windowStart else None,
              windowEnd = if (hasWindow) sched.windowEnd else None)
            lower = refit.lower
            upper = Some(refit.upper)
            staleness = Some(refit.staleness)
            lastUpdate = refit.lastUpdateSec
          } catch { case _: NotEnoughData => () } // keep first-pass thresholds
        }
        if (sched.frequency != "sub_daily") {
          minutesToNextDeadline(lastUpdate, sched,
            deadlineBufferHours(sensitivity),
            excludeWeekends = schedExclWeekends,
            excludedDays = excludedDays,
            tzOffsetSec = tzOffsetSec).foreach(du => upper = Some(du))
        }
        FreshnessResult(lower, upper, staleness, schedOpt)
      case _ =>
        FreshnessResult(lower, upper, staleness, schedOpt)
    }
  }

  /** infer_schedule over update-event times. */
  def inferSchedule(timesSec: Seq[Long], tzOffsetSec: Long = 0L): Option[Schedule] = {
    val times = timesSec.sorted
    if (times.length < 10) return None
    val rangeDays = (times.last - times.head) / 86400L
    if (rangeDays < 21) return None
    val gapsHours = times.sliding(2).map { case Seq(a, b) => (b - a) / 3600.0 }.toSeq
    val frequency = classifyFrequency(gapsHours)
    val activeDays = detectActiveDays(times, tzOffsetSec).getOrElse((0 until 7).toSet)
    val window = detectUpdateWindow(times, activeDays, tzOffsetSec)
    val conf = confidence(times, activeDays, window, tzOffsetSec)
    val stage =
      if (times.length < 20) "tentative"
      else if (conf >= 0.75) "active"
      else if (conf < 0.60) "irregular"
      else "tentative"
    Some(Schedule(stage, frequency, activeDays,
      window.map(_._1), window.map(_._2), conf, times.length))
  }
}
