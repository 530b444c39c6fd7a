package graft.streaming

import java.time.{DayOfWeek, LocalDate}
import java.time.temporal.TemporalAdjusters

/** Holiday calendar resolution — the engine-side analogue of the
  * reference's `get_holiday_dates`, which resolves country/market codes
  * through the `holidays` package (reference:
  * testgen/common/time_series_service.py:140-167). With no holiday
  * database in scope the calendar is COMPUTED: the United States federal
  * holiday rules are public law (5 U.S.C. 6103) and derive from the date
  * algorithmically, so "US" resolves without any external data. Other
  * codes resolve to empty, mirroring the reference's warn-and-skip for
  * unrecognized codes; deployments add calendars by extending
  * [[country]].
  *
  * Like the `holidays` package, BOTH the actual date and the observed
  * date (Saturday holidays observed the preceding Friday, Sunday
  * holidays the following Monday) are returned for fixed-date holidays.
  * Dates render as "yyyy-MM-dd" — the key format [[TimeSeries.isExcluded]]
  * and [[Freshness]] exclusion arithmetic look up.
  */
object HolidayCalendar {

  /** Resolve a list of codes over a year range (the reference resolves
    * over the years spanned by the series index,
    * time_series_service.py:141). Unknown codes contribute nothing. */
  def dates(codes: Seq[String], years: Range): Set[String] =
    codes.flatMap(c => country(c.trim.toUpperCase, years)).toSet

  /** Years spanned by a sequence of epoch-second timestamps, padded one
    * year forward so forecast points resolve too. */
  def yearsOf(tsSec: Seq[Long]): Range = {
    if (tsSec.isEmpty) return 1970 to 1970
    def y(t: Long) =
      LocalDate.ofEpochDay(math.floorDiv(t, 86400L)).getYear
    y(tsSec.min) to (y(tsSec.max) + 1)
  }

  private def country(code: String, years: Range): Set[String] = code match {
    case "US" => years.flatMap(usFederal).map(_.toString).toSet
    case _    => Set.empty
  }

  /** United States federal holidays for one year, with observed shifts. */
  def usFederal(year: Int): Set[LocalDate] = {
    def nth(month: Int, dow: DayOfWeek, n: Int): LocalDate =
      LocalDate.of(year, month, 1).`with`(TemporalAdjusters.dayOfWeekInMonth(n, dow))
    // fixed-date holidays observe Fri/Mon when they fall on a weekend
    def observed(d: LocalDate): Set[LocalDate] = d.getDayOfWeek match {
      case DayOfWeek.SATURDAY => Set(d, d.minusDays(1))
      case DayOfWeek.SUNDAY   => Set(d, d.plusDays(1))
      case _                  => Set(d)
    }
    val fixed = Seq(
      LocalDate.of(year, 1, 1),   // New Year's Day
      LocalDate.of(year, 7, 4),   // Independence Day
      LocalDate.of(year, 11, 11), // Veterans Day
      LocalDate.of(year, 12, 25)  // Christmas Day
    ) ++ (if (year >= 2021) Seq(LocalDate.of(year, 6, 19)) else Nil) // Juneteenth
    val floating = Set(
      nth(1, DayOfWeek.MONDAY, 3),     // Martin Luther King Jr. Day
      nth(2, DayOfWeek.MONDAY, 3),     // Washington's Birthday
      nth(5, DayOfWeek.MONDAY, -1),    // Memorial Day
      nth(9, DayOfWeek.MONDAY, 1),     // Labor Day
      nth(10, DayOfWeek.MONDAY, 2),    // Columbus Day
      nth(11, DayOfWeek.THURSDAY, 4))  // Thanksgiving Day
    fixed.flatMap(observed).toSet ++ floating
  }
}
