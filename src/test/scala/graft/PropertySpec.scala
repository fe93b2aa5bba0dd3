package graft

import graft.operators.{GoldOps, SilverOps}
import org.apache.spark.sql.functions._

/** Property-based invariants (SURVEY §5): randomized OHLCV frames through
  * the silver/gold operators must satisfy the domain laws regardless of
  * input shape. Ten seeded shapes per law (sizes, ticker counts and value
  * ranges all vary with the seed).
  */
class PropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def genBars(seed: Long) = {
    val rnd = new scala.util.Random(seed)
    val nTickers = 1 + rnd.nextInt(4)
    val nDays = 1 + rnd.nextInt(40)
    val rows = for {
      t <- 0 until nTickers
      d <- 0 until nDays
    } yield {
      // prices at 2-decimal grain, like real quotes (vwap accumulates pv in
      // DECIMAL(18,2) — sub-cent inputs would be a domain violation)
      def cents(x: Double) = math.round(x * 100).toDouble / 100
      val mid = cents(10.0 + rnd.nextDouble() * 90.0)
      val lo = cents(mid - rnd.nextDouble() * 5.0)
      val hi = cents(mid + rnd.nextDouble() * 5.0)
      (s"T$t", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(d)),
        mid, hi, lo, cents(mid + (rnd.nextDouble() - 0.5)), 100L + rnd.nextInt(1000), 5L)
    }
    rows.toDF("ticker", "date", "open", "high", "low", "close", "volume", "transactions")
  }

  private def forSeeds(f: org.apache.spark.sql.DataFrame => Unit): Unit =
    (1L to 10L).foreach(s => withClue(s"seed=$s ") { f(genBars(s * 7919)) })

  test("forward splits only shrink prices and grow volume; no-split tickers unchanged") {
    forSeeds { bars =>
      val splits = Seq(("T0", java.sql.Date.valueOf("2024-01-15"), 1.0, 2.0))
        .toDF("ticker", "execution_date", "split_from", "split_to")
      val adj = SilverOps.applySplits(bars, splits)
      val joined = bars.as("b").join(adj.as("a"), Seq("ticker", "date"))
        .select($"ticker", $"date",
          $"b.close".as("rawc"), $"a.close".as("adjc"),
          $"b.volume".as("rawv"), $"a.volume".as("adjv"))
      assert(joined.filter($"adjc" > $"rawc" + 1e-9).count() === 0)
      assert(joined.filter($"ticker" =!= "T0")
        .filter($"adjc" =!= $"rawc" || $"adjv" =!= $"rawv").count() === 0)
      assert(joined.filter($"adjv" < $"rawv").count() === 0)
    }
  }

  test("vwap lies within [min close, max close] per (ticker, year)") {
    forSeeds { bars =>
      val v = GoldOps.vwapSignals(bars)
      val bounds = v.groupBy($"ticker", $"year")
        .agg(min($"close").as("lo"), max($"close").as("hi"))
      val bad = v.join(bounds, Seq("ticker", "year"))
        .filter($"ytd_vwap" < $"lo" - 1e-9 || $"ytd_vwap" > $"hi" + 1e-9)
      assert(bad.count() === 0)
    }
  }

  test("weekly OHLC bounds contain the dailies; volumes add up") {
    forSeeds { daily =>
      val weekly = SilverOps.rollup(daily, "week")
      val keyed = daily.withColumn("wk",
        graft.functions.GraftFunctions.weekBucket($"date"))
      val joined = keyed.join(
        weekly.withColumnRenamed("date", "wk")
          .select($"ticker", $"wk", $"high".as("whigh"), $"low".as("wlow"),
            $"volume".as("wvol")),
        Seq("ticker", "wk"))
      assert(joined.filter($"high" > $"whigh" || $"low" < $"wlow").count() === 0)
      val volCheck = keyed.groupBy($"ticker", $"wk").agg(sum($"volume").as("dv"))
        .join(weekly.withColumnRenamed("date", "wk"), Seq("ticker", "wk"))
        .filter($"dv" =!= $"volume")
      assert(volCheck.count() === 0)
    }
  }

  test("strict rolling mean: null for the first n-1 rows, value from row n on") {
    forSeeds { bars =>
      val ind = SilverOps.indicators(bars)
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"ticker").orderBy($"date")))
      assert(ind.filter($"rn" < 20 && $"sma_20".isNotNull).count() === 0)
      assert(ind.filter($"rn" >= 20 && $"sma_20".isNull).count() === 0)
    }
  }
}
