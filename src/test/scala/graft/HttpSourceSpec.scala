package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources._
import java.net.InetSocketAddress
import java.time.LocalDate
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Drives [[HttpMarketSource]] against an in-process JDK HttpServer — the
  * live-client contract (parse, paging, 403 quota cancel) proven offline. */
class HttpSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private def base: String =
    s"http://127.0.0.1:${server.getAddress.getPort}"

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v2/aggs/grouped/locale/us/market/stocks/",
      (ex: HttpExchange) => {
        val date = ex.getRequestURI.getPath.split("/").last
        if (date == "2024-01-02")
          respond(ex, 200,
            """{"results":[
              |{"T":"AAPL","o":187.15,"h":188.44,"l":183.89,"c":185.64,"v":82488674,"n":1009074},
              |{"T":"MSFT","o":373.86,"h":375.9,"l":366.5,"c":370.87,"v":25258632,"n":557417}]}""".stripMargin)
        else if (date == "2024-01-03") respond(ex, 403, """{"status":"NOT_AUTHORIZED"}""")
        else respond(ex, 200, """{"results":[]}""")
      })
    server.createContext("/v3/reference/splits", (ex: HttpExchange) => {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      if (q.contains("cursor=page2"))
        respond(ex, 200,
          """{"results":[{"ticker":"NVDA","execution_date":"2024-06-10","split_from":1,"split_to":10}]}""")
      else
        respond(ex, 200,
          s"""{"results":[{"ticker":"AAPL","execution_date":"2020-08-31","split_from":1,"split_to":4}],
             |"next_url":"$base/v3/reference/splits?cursor=page2"}""".stripMargin)
    })
    // transient-failure fixtures for the retry contract
    server.createContext("/flaky", (ex: HttpExchange) => {
      val n = flakyHits.incrementAndGet()
      if (n <= 2) respond(ex, 503, """{"status":"UNAVAILABLE"}""")
      else respond(ex, 200, """{"results":[{"ticker":"OK"}]}""")
    })
    server.createContext("/dead", (ex: HttpExchange) => {
      deadHits.incrementAndGet()
      respond(ex, 500, """{"status":"ERROR"}""")
    })
    server.createContext("/ratelimited", (ex: HttpExchange) => {
      val n = rlHits.incrementAndGet()
      if (n == 1) {
        ex.getResponseHeaders.add("Retry-After", "7")
        respond(ex, 429, """{"status":"RATE_LIMIT"}""")
      } else respond(ex, 200, """{"results":[{"ticker":"OK"}]}""")
    })
    server.createContext("/forbidden", (ex: HttpExchange) => {
      forbiddenHits.incrementAndGet()
      respond(ex, 403, """{"status":"NOT_AUTHORIZED"}""")
    })
    server.start()
  }

  private val flakyHits = new java.util.concurrent.atomic.AtomicInteger
  private val deadHits = new java.util.concurrent.atomic.AtomicInteger
  private val rlHits = new java.util.concurrent.atomic.AtomicInteger
  private val forbiddenHits = new java.util.concurrent.atomic.AtomicInteger

  override def afterAll(): Unit = server.stop(0)

  private def source = new HttpMarketSource(base, "test-key")

  test("grouped-daily fetch parses one BarRow per ticker") {
    val rows = source.fetchDay(LocalDate.parse("2024-01-02"))
    assert(rows.map(_.ticker) === Seq("AAPL", "MSFT"))
    val aapl = rows.head
    assert(aapl.close === 185.64 && aapl.volume === 82488674L &&
      aapl.transactions === 1009074L)
    assert(aapl.date === LocalDate.parse("2024-01-02"))
  }

  test("splits fetch follows next_url cursor paging across pages") {
    val splits = source.fetchSplits(LocalDate.parse("2020-01-01"))
    assert(splits.map(_.ticker) === Seq("AAPL", "NVDA"))
    assert(splits.last.splitTo === 10.0)
  }

  test("error messages never leak the api key") {
    // both the 403 and generic non-200 paths interpolate the request URL,
    // which carries apiKey=<secret> — the exception must redact it
    val quota = intercept[PlanLimitExceeded](
      source.fetchDay(LocalDate.parse("2024-01-03")))
    assert(!quota.getMessage.contains("test-key"))
    assert(quota.getMessage.contains("apiKey=***"))
    val missing = intercept[RuntimeException](
      source.fetchPaged(s"$base/no/such/endpoint?x=1"))
    assert(!missing.getMessage.contains("test-key"))
  }

  test("HTTP 403 raises PlanLimitExceeded and cancels outstanding fetches") {
    intercept[PlanLimitExceeded](source.fetchDay(LocalDate.parse("2024-01-03")))
    // newest-first through ParallelFetch: the 403 day stops older windows
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val dates = Seq("2024-01-04", "2024-01-03", "2024-01-02")
      .map(LocalDate.parse)
    val (rows, done, hitLimit) =
      ParallelFetch.fetchAll(source, dates, parallelism = 1)
    assert(hitLimit)
    assert(done === Set(LocalDate.parse("2024-01-04")))
    assert(rows.isEmpty) // the only completed day is the empty one
  }

  // --- retry/backoff contract (reference clients.py:8-10) -----------------

  /** Source with instant recorded sleeps so retry tests run in μs. */
  private def retrying(maxAttempts: Int): (HttpMarketSource, scala.collection.mutable.Buffer[Long]) = {
    val slept = scala.collection.mutable.Buffer.empty[Long]
    val src = new HttpMarketSource(base, "test-key",
      HttpMarketSource.defaultClient(),
      RetryPolicy(maxAttempts = maxAttempts, baseDelayMs = 4, maxDelayMs = 32),
      sleeper = slept += _)
    (src, slept)
  }

  test("5xx retries with backoff and succeeds once the server heals") {
    flakyHits.set(0)
    val (src, slept) = retrying(maxAttempts = 5)
    val rows = src.fetchPaged(s"$base/flaky")
    assert(rows.map(_.path("ticker").asText()) === Seq("OK"))
    assert(flakyHits.get() === 3) // 503, 503, 200
    assert(slept.size === 2)
    // exponential cap doubles per attempt: first delay in [2,4], second in [4,8]
    assert(slept(0) >= 2 && slept(0) <= 4, s"slept=$slept")
    assert(slept(1) >= 4 && slept(1) <= 8, s"slept=$slept")
  }

  test("a dead endpoint gives up after maxAttempts with a loud error") {
    deadHits.set(0)
    val (src, slept) = retrying(maxAttempts = 3)
    val e = intercept[RuntimeException](src.fetchPaged(s"$base/dead"))
    assert(e.getMessage.contains("HTTP 500"))
    assert(e.getMessage.contains("gave up after 3 attempts"))
    assert(deadHits.get() === 3)
    assert(slept.size === 2) // no sleep after the final attempt
  }

  test("429 honors Retry-After as the delay floor") {
    rlHits.set(0)
    val (src, slept) = retrying(maxAttempts = 5)
    val rows = src.fetchPaged(s"$base/ratelimited")
    assert(rows.map(_.path("ticker").asText()) === Seq("OK"))
    // Retry-After: 7s floors the jittered delay but maxDelayMs=32ms ceils it
    assert(slept === Seq(32L), s"slept=$slept")
  }

  test("403 is never retried: quota exhaustion fails fast") {
    forbiddenHits.set(0)
    val (src, slept) = retrying(maxAttempts = 5)
    intercept[PlanLimitExceeded](src.fetchPaged(s"$base/forbidden"))
    assert(forbiddenHits.get() === 1)
    assert(slept.isEmpty)
  }

  test("env selection falls back to the fixture source offline") {
    val s = HttpMarketSource.barsSourceFromEnv(Seq("T1"))
    assert(s.isInstanceOf[FixtureBarsSource])
  }
}
