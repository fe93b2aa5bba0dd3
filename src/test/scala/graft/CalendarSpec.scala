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
}
