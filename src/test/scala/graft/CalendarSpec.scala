package graft

import graft.functions.TradingCalendar
import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite

class CalendarSpec extends AnyFunSuite {

  test("easter computus matches known dates") {
    assert(TradingCalendar.easterSunday(2024) === LocalDate.of(2024, 3, 31))
    assert(TradingCalendar.easterSunday(2025) === LocalDate.of(2025, 4, 20))
    assert(TradingCalendar.easterSunday(2026) === LocalDate.of(2026, 4, 5))
  }

  test("2024 NYSE full-close holidays") {
    val h = TradingCalendar.holidays(2024)
    val expected = Set(
      LocalDate.of(2024, 1, 1),   // New Year
      LocalDate.of(2024, 1, 15),  // MLK
      LocalDate.of(2024, 2, 19),  // Washington
      LocalDate.of(2024, 3, 29),  // Good Friday
      LocalDate.of(2024, 5, 27),  // Memorial
      LocalDate.of(2024, 6, 19),  // Juneteenth
      LocalDate.of(2024, 7, 4),   // Independence
      LocalDate.of(2024, 9, 2),   // Labor
      LocalDate.of(2024, 11, 28), // Thanksgiving
      LocalDate.of(2024, 12, 25)) // Christmas
    assert(h === expected)
  }

  test("observance shifts: July 4 2026 is a Saturday, observed Friday July 3") {
    assert(TradingCalendar.holidays(2026).contains(LocalDate.of(2026, 7, 3)))
    assert(!TradingCalendar.isTradingDay(LocalDate.of(2026, 7, 3)))
  }

  test("trading days exclude weekends and holidays") {
    // first full week of July 2024: Jul 1(M) 2(T) 3(W) trade, 4(Th) holiday, 5(F) trades
    val days = TradingCalendar.tradingDays(
      LocalDate.of(2024, 7, 1), LocalDate.of(2024, 7, 7))
    assert(days.map(_.getDayOfMonth) === Seq(1, 2, 3, 5))
  }

  test("2024 has 252 trading days") {
    assert(TradingCalendar.tradingDays(
      LocalDate.of(2024, 1, 1), LocalDate.of(2024, 12, 31)).size === 252)
  }

  // --- market-session gating (reference utils/calendar.py:36-116) ---------

  private def utc(s: String) = java.time.Instant.parse(s)

  test("pre-open on a trading day: closed, data not yet available") {
    // Wed 2024-01-10 09:00 ET (EST = UTC-5)
    val now = utc("2024-01-10T14:00:00Z")
    assert(!TradingCalendar.isMarketOpen(now))
    assert(!TradingCalendar.isDataAvailableForToday(now))
    assert(TradingCalendar.ingestEndDate(now) === LocalDate.of(2024, 1, 9))
  }

  test("mid-session: open, data not available") {
    val now = utc("2024-01-10T15:30:00Z") // 10:30 ET
    assert(TradingCalendar.isMarketOpen(now))
    assert(!TradingCalendar.isDataAvailableForToday(now))
  }

  test("session bounds are inclusive: 09:30 and 16:00 ET both open") {
    assert(TradingCalendar.isMarketOpen(utc("2024-01-10T14:30:00Z")))
    assert(TradingCalendar.isMarketOpen(utc("2024-01-10T21:00:00Z")))
  }

  test("just after close: inside the publish delay, still unavailable") {
    val now = utc("2024-01-10T21:10:00Z") // 16:10 ET
    assert(!TradingCalendar.isMarketOpen(now))
    assert(!TradingCalendar.isDataAvailableForToday(now))
    assert(TradingCalendar.ingestEndDate(now) === LocalDate.of(2024, 1, 9))
  }

  test("30 minutes past close: today's data is fetchable") {
    val now = utc("2024-01-10T21:30:00Z") // 16:30 ET, delay elapsed
    assert(!TradingCalendar.isMarketOpen(now))
    assert(TradingCalendar.isDataAvailableForToday(now))
    assert(TradingCalendar.ingestEndDate(now) === LocalDate.of(2024, 1, 10))
  }

  test("DST: the ET session math holds in July (EDT = UTC-4)") {
    assert(TradingCalendar.isMarketOpen(utc("2024-07-10T15:30:00Z"))) // 11:30 EDT
    assert(TradingCalendar.isDataAvailableForToday(
      utc("2024-07-10T20:45:00Z"))) // 16:45 EDT
    // same wall-clock UTC instant in January would still be mid-session
    assert(TradingCalendar.isMarketOpen(utc("2024-01-10T20:45:00Z"))) // 15:45 EST
  }

  test("weekend: closed all day, ingest ends at Friday") {
    val now = utc("2024-01-13T17:00:00Z") // Saturday noon ET
    assert(!TradingCalendar.isMarketOpen(now))
    assert(!TradingCalendar.isDataAvailableForToday(now))
    assert(TradingCalendar.ingestEndDate(now) === LocalDate.of(2024, 1, 12))
  }

  test("holiday: Christmas Wednesday is closed with yesterday as end") {
    val now = utc("2024-12-25T17:00:00Z")
    assert(!TradingCalendar.isMarketOpen(now))
    assert(!TradingCalendar.isDataAvailableForToday(now))
    assert(TradingCalendar.ingestEndDate(now) === LocalDate.of(2024, 12, 24))
  }

  test("early closes: 2024 has exactly the three NYSE half-days") {
    assert(TradingCalendar.earlyCloses(2024) === Set(
      LocalDate.of(2024, 7, 3),    // Wednesday before July 4
      LocalDate.of(2024, 11, 29),  // Friday after Thanksgiving
      LocalDate.of(2024, 12, 24))) // Tuesday Christmas Eve
  }

  test("early closes interact with observance: 2026 July 3 and 2021 Dec 24 " +
    "are observed full-close holidays, not half-days") {
    // July 4 2026 is a Saturday → July 3 is the observed holiday
    assert(!TradingCalendar.earlyCloses(2026).contains(LocalDate.of(2026, 7, 3)))
    assert(!TradingCalendar.isTradingDay(LocalDate.of(2026, 7, 3)))
    // Dec 25 2021 is a Saturday → Dec 24 (Friday) is the observed holiday
    assert(!TradingCalendar.earlyCloses(2021).contains(LocalDate.of(2021, 12, 24)))
    assert(!TradingCalendar.isTradingDay(LocalDate.of(2021, 12, 24)))
    // the Friday after Thanksgiving is a half-day every year
    assert(TradingCalendar.earlyCloses(2021).contains(LocalDate.of(2021, 11, 26)))
  }

  test("half-day session: closes at 1 PM ET, data available at 1:30 PM") {
    // Black Friday 2024 (Nov 29): 1 PM ET close = 18:00 UTC (EST)
    assert(TradingCalendar.isMarketOpen(utc("2024-11-29T17:59:00Z")))  // 12:59 ET
    assert(TradingCalendar.isMarketOpen(utc("2024-11-29T18:00:00Z")))  // 13:00 inclusive
    assert(!TradingCalendar.isMarketOpen(utc("2024-11-29T19:00:00Z"))) // 14:00 closed
    // inside the publish delay (13:15 ET) → not yet available
    assert(!TradingCalendar.isDataAvailableForToday(utc("2024-11-29T18:15:00Z")))
    // 13:30 ET → available three hours earlier than a full day would allow
    assert(TradingCalendar.isDataAvailableForToday(utc("2024-11-29T18:30:00Z")))
    assert(TradingCalendar.ingestEndDate(utc("2024-11-29T18:30:00Z")) ===
      LocalDate.of(2024, 11, 29))
    // July 3 2024 half-day under EDT: 13:30 ET = 17:30 UTC
    assert(TradingCalendar.isDataAvailableForToday(utc("2024-07-03T17:30:00Z")))
  }
}
