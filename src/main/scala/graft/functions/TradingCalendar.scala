package graft.functions

import java.time.{DayOfWeek, LocalDate, Month}
import java.time.temporal.TemporalAdjusters

/** NYSE trading calendar (reference `utils/calendar.py:13-116` — SURVEY F13).
  *
  * The reference delegates to `pandas_market_calendars`; there is no JVM
  * equivalent, so the rules are implemented directly: weekends plus the nine
  * NYSE full-close holidays, with Saturday→Friday / Sunday→Monday observance
  * shifts and Easter-based Good Friday (anonymous Gregorian computus).
  * Driver-side: the result feeds missing-date planning and can be broadcast
  * as a lookup DataFrame for join-based filtering at scale.
  */
object TradingCalendar {

  /** Gregorian Easter Sunday (anonymous computus). */
  def easterSunday(year: Int): LocalDate = {
    val a = year % 19; val b = year / 100; val c = year % 100
    val d = b / 4; val e = b % 4; val f = (b + 8) / 25
    val g = (b - f + 1) / 3; val h = (19 * a + b - d - g + 15) % 30
    val i = c / 4; val k = c % 4
    val l = (32 + 2 * e + 2 * i - h - k) % 7
    val m = (a + 11 * h + 22 * l) / 451
    val month = (h + l - 7 * m + 114) / 31
    val day = ((h + l - 7 * m + 114) % 31) + 1
    LocalDate.of(year, month, day)
  }

  private def nthWeekday(year: Int, month: Month, dow: DayOfWeek, n: Int): LocalDate =
    LocalDate.of(year, month, 1).`with`(TemporalAdjusters.dayOfWeekInMonth(n, dow))

  private def lastWeekday(year: Int, month: Month, dow: DayOfWeek): LocalDate =
    LocalDate.of(year, month, 1).`with`(TemporalAdjusters.lastInMonth(dow))

  /** Saturday→Friday, Sunday→Monday observance shift for fixed-date
    * holidays (NYSE rule). */
  private def observed(d: LocalDate): LocalDate = d.getDayOfWeek match {
    case DayOfWeek.SATURDAY => d.minusDays(1)
    case DayOfWeek.SUNDAY   => d.plusDays(1)
    case _                  => d
  }

  /** Full-close NYSE holidays for a year. */
  def holidays(year: Int): Set[LocalDate] = {
    val fixed = Seq(
      LocalDate.of(year, 1, 1),                                   // New Year
      LocalDate.of(year, 7, 4),                                   // Independence
      LocalDate.of(year, 12, 25)) ++                              // Christmas
      (if (year >= 2022) Seq(LocalDate.of(year, 6, 19)) else Nil) // Juneteenth
    val ruled = Seq(
      nthWeekday(year, Month.JANUARY, DayOfWeek.MONDAY, 3),       // MLK (since 1998)
      nthWeekday(year, Month.FEBRUARY, DayOfWeek.MONDAY, 3),      // Washington
      easterSunday(year).minusDays(2),                            // Good Friday
      lastWeekday(year, Month.MAY, DayOfWeek.MONDAY),             // Memorial
      nthWeekday(year, Month.SEPTEMBER, DayOfWeek.MONDAY, 1),     // Labor
      nthWeekday(year, Month.NOVEMBER, DayOfWeek.THURSDAY, 4))    // Thanksgiving
    (fixed.map(observed) ++ ruled).toSet
  }

  def isTradingDay(d: LocalDate): Boolean =
    d.getDayOfWeek != DayOfWeek.SATURDAY &&
      d.getDayOfWeek != DayOfWeek.SUNDAY &&
      !holidays(d.getYear).contains(d)

  /** Early-close (1:00 PM ET half-day) sessions for a year. NYSE rules as
    * modeled by `pandas_market_calendars`' NYSE calendar (the reference's
    * backing library): the Friday after Thanksgiving, July 3 when it falls
    * Mon–Thu (if July 4 lands on Saturday, July 3 becomes the *observed
    * full-close holiday* instead — e.g. 2026), and Christmas Eve when it
    * falls Mon–Thu (same observance interaction with Dec 25 — e.g. 2021).
    * Half-days keep the same *day set* (`isTradingDay` is unchanged) but
    * close at [[EarlyCloseTime]], which moves the ingest-gating cutoffs. */
  def earlyCloses(year: Int): Set[LocalDate] = {
    val dayAfterThanksgiving =
      nthWeekday(year, Month.NOVEMBER, DayOfWeek.THURSDAY, 4).plusDays(1)
    val monToThu: LocalDate => Boolean = d => {
      val v = d.getDayOfWeek.getValue; v >= 1 && v <= 4
    }
    (Seq(dayAfterThanksgiving) ++
      Seq(LocalDate.of(year, 7, 3), LocalDate.of(year, 12, 24)).filter(monToThu))
      .filter(isTradingDay).toSet
  }

  /** Trading days in [start, end] inclusive — the missing-date planner's
    * required-dates grid (`bronze/main.py:42-53`). */
  def tradingDays(start: LocalDate, end: LocalDate): Seq[LocalDate] =
    Iterator.iterate(start)(_.plusDays(1))
      .takeWhile(!_.isAfter(end))
      .filter(isTradingDay)
      .toSeq

  // --- market-session gating (reference `utils/calendar.py:36-116`) --------
  // A scheduled ingest must not fetch an in-progress trading day: the API
  // serves partial bars until the session closes and the provider finishes
  // publishing. All clock math happens in the exchange's own zone so the
  // gate is correct from any runner timezone, across DST.

  /** NYSE's zone: session times are defined in local exchange time. */
  val MarketZone: java.time.ZoneId = java.time.ZoneId.of("America/New_York")
  val OpenTime: java.time.LocalTime = java.time.LocalTime.of(9, 30)
  val CloseTime: java.time.LocalTime = java.time.LocalTime.of(16, 0)
  /** Half-day sessions close at 1:00 PM ET (see [[earlyCloses]]). */
  val EarlyCloseTime: java.time.LocalTime = java.time.LocalTime.of(13, 0)

  /** Session close for a given trading day: 1 PM on half-days, 4 PM else. */
  def closeTime(d: LocalDate): java.time.LocalTime =
    if (earlyCloses(d.getYear).contains(d)) EarlyCloseTime else CloseTime
  /** Providers finalize the day's bars ~after close; the reference waits
    * 30 minutes (`calendar.py:115-116`). */
  val PublishDelayMinutes: Long = 30

  /** Is the NYSE actively trading at `now`? (`calendar.py:36-71`:
    * open ≤ now ≤ close on a trading day, bounds inclusive). */
  def isMarketOpen(now: java.time.Instant): Boolean = {
    val zdt = now.atZone(MarketZone)
    isTradingDay(zdt.toLocalDate) && {
      val t = zdt.toLocalTime
      !t.isBefore(OpenTime) && !t.isAfter(closeTime(zdt.toLocalDate))
    }
  }

  /** Should today's bars exist upstream yet? (`calendar.py:74-116`: today
    * is a trading day, the session has closed, and the publish delay has
    * elapsed). Pre-open and mid-session both gate to false. On a half-day
    * the cutoff is 1:30 PM ET, not 4:30 — an early close *advances* data
    * availability, which a full-day-only model would miss. */
  def isDataAvailableForToday(now: java.time.Instant): Boolean = {
    val zdt = now.atZone(MarketZone)
    isTradingDay(zdt.toLocalDate) && !isMarketOpen(now) &&
      !zdt.toLocalTime.isBefore(
        closeTime(zdt.toLocalDate).plusMinutes(PublishDelayMinutes))
  }

  /** Newest date an ingest planner may request at `now`: today once its
    * data is published, otherwise yesterday (non-trading days fall out of
    * the required-dates grid regardless). */
  def ingestEndDate(now: java.time.Instant): LocalDate = {
    val today = now.atZone(MarketZone).toLocalDate
    if (isDataAvailableForToday(now)) today else today.minusDays(1)
  }
}
