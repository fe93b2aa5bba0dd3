package graft.sources

import graft.functions.TradingCalendar
import java.time.LocalDate
import java.util.concurrent.atomic.AtomicBoolean
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.{Failure, Success, Try}

/** Bronze ingest source adapters (SURVEY S6-S8).
  *
  * The reference fetches one REST call per trading day from a market-data
  * API with a 4-thread pool, newest-first, cancelling outstanding work on a
  * 403 plan-limit response (`bronze/main.py:81-205`). That is driver-scale
  * work (a few thousand small HTTP calls), so it stays driver-side behind
  * this interface — a `DataSourceV2` would buy nothing. Implementations:
  * an offline fixture-backed source here; a production deployment adds an
  * HTTP one with the same contract.
  */
trait BarsSource {
  /** Rows for one trading day: (ticker, date, open, high, low, close,
    * volume, transactions). Throws [[PlanLimitExceeded]] on quota. */
  def fetchDay(date: LocalDate): Seq[BarRow]
}

final case class BarRow(ticker: String, date: LocalDate, open: Double,
                        high: Double, low: Double, close: Double,
                        volume: Long, transactions: Long)

final class PlanLimitExceeded(msg: String) extends RuntimeException(msg)

/** Missing-date planner (SURVEY J3 driver-side): required trading days
  * minus already-stored partition dates, newest first — so a quota cutoff
  * loses the oldest days, not the newest (`bronze/main.py:56-70`, `:227`). */
object IngestPlanner {
  def missingDates(startYear: Int, today: LocalDate,
                   stored: Set[LocalDate]): Seq[LocalDate] =
    TradingCalendar.tradingDays(LocalDate.of(startYear, 1, 1), today)
      .filterNot(stored)
      .sortBy[Long](-_.toEpochDay)
}

/** Parallel fetch driver: bounded concurrency, newest-first submission,
  * cancel-on-quota — the reference's ThreadPoolExecutor logic
  * (`bronze/main.py:153-205`) re-expressed with scala Futures.
  *
  * Returns (fetched rows, dates actually completed, hit-limit flag).
  */
object ParallelFetch {
  def fetchAll(source: BarsSource, dates: Seq[LocalDate], parallelism: Int = 4)
              (implicit ec: ExecutionContext): (Seq[BarRow], Set[LocalDate], Boolean) = {
    val stopped = new AtomicBoolean(false)
    val results = dates.grouped(parallelism).foldLeft(
      Vector.empty[(LocalDate, Try[Seq[BarRow]])]) { (acc, window) =>
      if (stopped.get) acc
      else {
        // sliding-window submission: at most `parallelism` in flight, so a
        // 403 in one window prevents the next window from ever launching
        val fs = window.map(d => d -> Future(source.fetchDay(d)))
        val done = fs.map { case (d, f) => d -> Try(Await.result(f, Duration.Inf)) }
        done.foreach {
          case (_, Failure(_: PlanLimitExceeded)) => stopped.set(true)
          case _ =>
        }
        acc ++ done
      }
    }
    val ok = results.collect { case (d, Success(rows)) => (d, rows) }
    val hitLimit = results.exists {
      case (_, Failure(_: PlanLimitExceeded)) => true
      case _ => false
    }
    (ok.flatMap(_._2), ok.map(_._1).toSet, hitLimit)
  }
}

/** Offline fixture-backed source: deterministic synthetic bars derived from
  * the date (used by specs; stands in for the HTTP implementation). */
final class FixtureBarsSource(tickers: Seq[String],
                              quotaDates: Set[LocalDate] = Set.empty) extends BarsSource {
  override def fetchDay(date: LocalDate): Seq[BarRow] = {
    if (quotaDates.contains(date))
      throw new PlanLimitExceeded(s"plan limit at $date")
    tickers.map { t =>
      val seed = (t.hashCode.toLong * 31 + date.toEpochDay) & 0x7fffffff
      val base = 50.0 + (seed % 1000) / 10.0
      BarRow(t, date, base, base + 2.0, base - 2.0, base + 1.0,
        1000 + seed % 10000, 10 + seed % 100)
    }
  }
}
