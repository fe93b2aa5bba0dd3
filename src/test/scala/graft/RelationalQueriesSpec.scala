package graft

import org.apache.spark.sql.functions._

class RelationalQueriesSpec extends SparkSpecBase {

  test("every declared query has an oracle or is explicitly rows-only") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all queries run non-empty on sf0.001 (except set-difference ones)") {
    val mayBeEmpty = Set("q_anti_join", "q_except", "q_anomaly_counts")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("product aggregate is exact and skips nulls") {
    import spark.implicits._
    val df = Seq(("a", Some(2.0)), ("a", Some(3.0)), ("a", None),
      ("b", None)).toDF("k", "v")
    val got = df.groupBy($"k")
      .agg(graft.functions.ProductAgg.product($"v").as("p"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("a").contains(6.0))
    assert(got("b").isEmpty)
  }

  test("dedup keep-last keeps exactly one row per key") {
    val df = SparkEntry.queries("q_dedup_keep_last")(spark, sf)
    val dupes = df.groupBy(col("o_custkey")).count().filter(col("count") > 1).count()
    assert(dupes === 0)
  }

  test("topk is ordered and bounded") {
    val rows = SparkEntry.queries("q_topk")(spark, sf).collect()
    assert(rows.length <= 20)
    val totals = rows.map(_.getDouble(1))
    assert(totals.sameElements(totals.sorted.reverse))
  }

  test("EMA fold matches the hand-computed recursion; MACD equals the " +
    "three-ema composition") {
    import java.sql.Date
    import spark.implicits._
    val bars = Seq(
      ("A", Date.valueOf("2024-01-02"), 10.0),
      ("A", Date.valueOf("2024-01-03"), 20.0),
      ("A", Date.valueOf("2024-01-04"), 30.0),
      ("B", Date.valueOf("2024-01-02"), 5.0))
      .toDF("ticker", "date", "close")
    val ema = graft.operators.SilverOps.ema(bars, alpha = 0.25)
      .collect().map(r => (r.getString(0), r.getDate(1).toString) -> r.getDouble(3)).toMap
    // seed 10; then .25*20+.75*10 = 12.5; then .25*30+.75*12.5 = 16.875
    assert(ema(("A", "2024-01-02")) === 10.0)
    assert(ema(("A", "2024-01-03")) === 12.5)
    assert(ema(("A", "2024-01-04")) === 16.875)
    assert(ema(("B", "2024-01-02")) === 5.0)   // per-key recursion restarts
    // MACD single-fold == fast-ema minus slow-ema, signal == ema of macd
    val fast = graft.operators.SilverOps.ema(bars, 0.1875)
      .withColumnRenamed("ema", "f")
    val slow = graft.operators.SilverOps.ema(bars, 0.0625)
      .select(col("ticker"), col("date"), col("ema").as("s"))
    val composed = fast.join(slow, Seq("ticker", "date"))
      .withColumn("macd", col("f") - col("s"))
    val sig = graft.operators.SilverOps.ema(composed, 0.25, valueCol = "macd")
      .select(col("ticker"), col("date"), col("ema").as("sig"))
    val expect = composed.join(sig, Seq("ticker", "date"))
      .select(col("ticker"), col("date"), col("macd"), col("sig"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val got = graft.operators.SilverOps.macd(bars)
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    assert(got === expect)
    // Wilder RSI conventions: first bar NULL (no move yet), an all-gain
    // history pins 100, a mixed history lands strictly between
    val rsi = graft.operators.SilverOps.wilderRsi(bars)
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(rsi(("A", "2024-01-02")) === None)
    assert(rsi(("A", "2024-01-04")) === Some(100.0)) // 10→20→30 all gains
    assert(rsi(("B", "2024-01-02")) === None)        // single bar: no move
    val mixed = Seq(
      ("C", java.sql.Date.valueOf("2024-01-02"), 10.0),
      ("C", java.sql.Date.valueOf("2024-01-03"), 20.0),
      ("C", java.sql.Date.valueOf("2024-01-04"), 15.0))
      .toDF("ticker", "date", "close")
    val m3 = graft.operators.SilverOps.wilderRsi(mixed).collect()
      .map(r => r.getDate(1).toString ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // ag = .9375*.625 = .5859375, al = .0625*5 = .3125 → between 0 and 100
    val v = m3("2024-01-04").get
    assert(v > 0 && v < 100)
  }

  test("Holt fold: hand-computed level/trend/forecast recursion") {
    import java.sql.Date
    import spark.implicits._
    val bars = Seq(
      ("A", Date.valueOf("2024-01-02"), 10.0),
      ("A", Date.valueOf("2024-01-03"), 20.0),
      ("A", Date.valueOf("2024-01-04"), 30.0))
      .toDF("ticker", "date", "close")
    val out = graft.operators.SilverOps.holt(bars)
      .collect().map(r => r.getDate(1).toString ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out("2024-01-02") === ((10.0, 0.0, 10.0)))
    // l=.5*20+.5*10=15, t=.25*5=1.25; forecast was pre-update l+t=10
    assert(out("2024-01-03") === ((15.0, 1.25, 10.0)))
    // fc=16.25; l=.5*30+.5*16.25=23.125; t=.25*8.125+.75*1.25=2.96875
    assert(out("2024-01-04") === ((23.125, 2.96875, 16.25)))
  }

  test("CUSUM fold: hand-computed alarms, reset-after-signal, per-key restart") {
    import java.sql.Date
    import spark.implicits._
    val bars = Seq(
      ("A", Date.valueOf("2024-01-02"), 10.00),
      ("A", Date.valueOf("2024-01-03"), 10.50),
      ("A", Date.valueOf("2024-01-04"), 9.00),
      ("A", Date.valueOf("2024-01-05"), 12.00),
      ("B", Date.valueOf("2024-01-02"), 99.0))
      .toDF("ticker", "date", "close")
    val out = graft.operators.SilverOps
      .cusum(bars, driftCents = 20L, thresholdCents = 100L)
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getLong(3), r.getLong(4), r.getInt(5))).toMap
    assert(out(("A", "2024-01-02")) === ((0L, 0L, 0)))
    // Δ=+50: sp=max(0,50-20)=30, no alarm
    assert(out(("A", "2024-01-03")) === ((30L, 0L, 0)))
    // Δ=-150: sn=max(0,150-20)=130 > 100 → alarm, both sides reset
    assert(out(("A", "2024-01-04")) === ((0L, 130L, 1)))
    // post-reset Δ=+300: sp=280 > 100 → alarm again (state restarted)
    assert(out(("A", "2024-01-05")) === ((280L, 0L, 1)))
    assert(out(("B", "2024-01-02")) === ((0L, 0L, 0))) // per-key restart
  }

  test("KAMA fold matches an independent scalar replica (adaptive alpha)") {
    import java.sql.Date
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    var px = 100.0
    val closes = (0 until 40).map { _ =>
      px = math.max(1.0, px + (rnd.nextInt(400) - 195) / 100.0); px
    }
    val bars = closes.zipWithIndex.map { case (c, i) =>
      ("A", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)), c)
    }.toDF("ticker", "date", "close")
    val n = 10
    // replica: cents ER, sc = (er*0.5625 + 0.0625)^2, kama recursion
    val cents = closes.map(c => math.round(c * 100))
    val expect = Array.fill[Option[Double]](closes.size)(None)
    var k = 0.0
    for (j <- closes.indices) {
      if (j == n - 1) { k = closes(j); expect(j) = Some(k) }
      else if (j >= n) {
        val vol = (j - n + 1 to j).map(i => math.abs(cents(i) - cents(i - 1))).sum
        val chg = math.abs(cents(j) - cents(j - n))
        val er = if (vol == 0L) 0.0 else chg.toDouble / vol.toDouble
        val scr = er * 0.5625 + 0.0625
        k = k + (scr * scr) * (closes(j) - k)
        expect(j) = Some(k)
      }
    }
    val got = graft.operators.SilverOps.kama(bars, n).collect()
      .map(r => r.getDate(1).toString ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    for (j <- closes.indices) {
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(j.toLong).toString
      assert(got(d) === expect(j), s"day $d")
    }
  }
}
