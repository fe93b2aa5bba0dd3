package graft.pipeline

import graft.Tables
import graft.operators.{GoldOps, PatternOps, SilverOps}
import graft.queries.DomainQueries
import graft.sources.{Checkpoints, Storage, TableRef}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The medallion pipeline end-to-end: bronze ingest → silver transform →
  * gold analytics, with the reference's incremental-batch control flow
  * (reference `bronze/main.py`, `silver/main.py`, `gold/main.py` — SURVEY §3).
  *
  * Spark-first deltas from the reference, deliberate:
  *  - bronze writes only the new date partitions via dynamic partition
  *    overwrite instead of read-concat-rewrite of the whole dataset;
  *  - no ticker batching: silver is one job per table, partitioning does
  *    the memory management;
  *  - append-vs-full-rewrite stays a driver decision off checkpoint state
  *    (`silver/incremental.py:20-66`), but both paths are plain writes.
  */
final case class Lake(root: String) {
  def bronze(name: String): TableRef = TableRef(root, "bronze", name)
  def silver(name: String): TableRef = TableRef(root, "silver", name)
  def gold(name: String): TableRef = TableRef(root, "gold", name)
  def checkpointPath: String = s"$root/checkpoints.json"
}

/** Stage timer, printed only when GRAFT_PIPELINE_TIMING is set — shared by
  * the pipeline orchestrator and the scale benchmark. The bench flips
  * [[record]] on around its pipeline_full loop to get a per-stage
  * breakdown into BENCH json (accumulated across reps; caller divides). */
object Timing {
  private val recorded =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()
  @volatile private var recording = false
  def record(on: Boolean): Unit = { recorded.clear(); recording = on }
  def snapshot(tag: String): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    recorded.asScala.toMap.collect {
      case (k, v) if k.startsWith(tag + ".") =>
        k.stripPrefix(tag + ".") -> v.doubleValue
    }
  }
  def stage[A](tag: String, name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a = f
    val secs = (System.nanoTime() - t0) / 1e9
    if (recording)
      recorded.compute(s"$tag.$name",
        (_, prev) => java.lang.Double.valueOf(
          if (prev == null) secs else prev.doubleValue + secs))
    if (sys.env.contains("GRAFT_PIPELINE_TIMING"))
      println(f"[$tag] $name%-10s $secs%.2f s")
    a
  }
}

object Pipeline {

  /** Bronze: land the daily bars (fixture-backed stand-in for the REST
    * ingest S6-S8), Hive-partitioned, plus the splits dim.
    *
    * Partition grain (`GRAFT_BRONZE_GRAIN`): `date` matches the reference's
    * layout and keeps incremental ingest O(day) via dynamic partition
    * overwrite; `month` is for bulk backfills, where per-day directories at
    * small data-per-day hit the small-files trap; `auto` (default) picks by
    * measured volume — per-day directories only once a day of data is big
    * enough to be worth a directory (at 100 TB / 5 y that's ~80 GB/day →
    * date; at test scale factors → month). Both layouts read back
    * identically (`readTable` + pruning handle either); PipelineSpec proves
    * silver is byte-identical on top of each. */
  def runBronze(spark: SparkSession, sfDir: String, lake: Lake,
                grain: String = sys.env.getOrElse("GRAFT_BRONZE_GRAIN", "auto")): Unit = {
    // one shuffle on the partition key so each partition directory gets
    // exactly one writer (otherwise: |dirs| × |tasks| tiny files)
    val raw = Tables.bars(spark, sfDir)
    val resolved = if (grain != "auto") grain else {
      // scan-free volume estimate: optimizer stats = source file bytes;
      // day span from footer min/max via a single-column agg
      val bytes = raw.queryExecution.optimizedPlan.stats.sizeInBytes
      val span = raw.agg(min(col("date")).as("lo"), max(col("date")).as("hi")).first()
      // empty source ⇒ null min/max: degrade to the coarse grain instead of
      // NPEing before the (empty) write
      if (span.isNullAt(0) || span.isNullAt(1)) "month"
      else {
        val days = math.max(1L,
          java.time.temporal.ChronoUnit.DAYS.between(
            span.getDate(0).toLocalDate, span.getDate(1).toLocalDate) + 1)
        if (bytes / days >= BigInt(16L << 20)) "date" else "month"
      }
    }
    val (bars, partCols) = resolved match {
      case "date"  => (raw.repartition(col("date")), Seq("date"))
      case "month" => (raw.withColumn("month", trunc(col("date"), "month"))
        .repartition(col("month")), Seq("month"))
      case other => throw new IllegalArgumentException(s"bronze grain: $other")
    }
    // the two bronze tables are independent — overlap the tiny splits
    // write with the heavy partitioned stocks write (guide §2.6) instead
    // of paying its job+commit tail serially after
    locally {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      Timing.stage("pipesub", "bronze.writes")(
        Await.result(Future.sequence(Seq(
          Future(Storage.writeTable(bars, lake.bronze("stocks"),
            partitionBy = partCols)),
          Future(Storage.writeTable(
            DomainQueries.syntheticSplits(spark), lake.bronze("splits"))))),
          Duration.Inf))
    }
    // checkpoint high-water mark from the WRITTEN table: `date` is its
    // partition column there, so max(date) is answered from the partition
    // index — probing the source instead would re-run the whole bars
    // aggregation a second time.
    val maxDate = Timing.stage("pipesub", "bronze.ckpt")(
      Storage.maxDate(spark, lake.bronze("stocks")))
    Checkpoints.save(lake.checkpointPath,
      Checkpoints.load(lake.checkpointPath) +
        ("bronze_stocks_last_date" -> maxDate.map(_.toString).getOrElse("")))
  }

  /** Bronze ingest from a live [[graft.sources.BarsSource]] — the
    * reference's actual bronze flow (`bronze/main.py:56-205`): plan the
    * missing trading days (required minus stored, NEWEST first so a quota
    * cutoff loses the oldest days), fetch them in parallel with
    * cancel-on-403, append the fetched days as date partitions, advance
    * the checkpoint. Fetching is driver-scale (a few thousand small HTTP
    * calls); the write is one partitioned append. Returns (days fetched,
    * hit plan limit). */
  def runIngest(spark: SparkSession, source: graft.sources.BarsSource,
                lake: Lake, startYear: Int, today: java.time.LocalDate,
                parallelism: Int = 4): (Int, Boolean) = {
    import spark.implicits._
    val ref = lake.bronze("stocks")
    val stored: Set[java.time.LocalDate] =
      if (!Storage.tableExists(spark, ref)) Set.empty
      else Storage.readTable(spark, ref).select(col("date")).distinct()
        .collect().map(_.getDate(0).toLocalDate).toSet
    val missing = graft.sources.IngestPlanner.missingDates(startYear, today, stored)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val (rows, doneDates, hitLimit) =
      graft.sources.ParallelFetch.fetchAll(source, missing, parallelism)
    if (rows.nonEmpty) {
      val bars = rows.toDF()
        .select(col("ticker"), col("date").cast("date"),
          col("open"), col("high"), col("low"), col("close"),
          col("volume"), col("transactions"))
        .repartition(col("date"))
      Storage.writeTable(bars, ref, SaveMode.Append, partitionBy = Seq("date"))
    }
    // first run with zero fetched rows (immediate 403, or every day empty):
    // the bronze path does not exist yet — the contract is (0, hitLimit)
    // with an empty checkpoint, not an AnalysisException from the probe
    val maxDate =
      if (Storage.tableExists(spark, ref)) Storage.maxDate(spark, ref)
      else None
    Checkpoints.save(lake.checkpointPath,
      Checkpoints.load(lake.checkpointPath) +
        ("bronze_stocks_last_date" -> maxDate.map(_.toString).getOrElse("")))
    (doneDates.size, hitLimit)
  }

  /** Clock-gated ingest (reference `bronze/main.py` guarded by
    * `utils/calendar.py:74-116`): derives the newest fetchable day from
    * the wall clock via [[graft.functions.TradingCalendar.ingestEndDate]],
    * so a cron'd run during (or within the publish delay after) a trading
    * session never ingests a partial day. The date-explicit overload stays
    * the testable core. */
  def runIngest(spark: SparkSession, source: graft.sources.BarsSource,
                lake: Lake, startYear: Int,
                now: java.time.Instant): (Int, Boolean) =
    runIngest(spark, source, lake, startYear,
      graft.functions.TradingCalendar.ingestEndDate(now))

  /** Should silver fully rewrite? First run, or any split executed after
    * silver's high-water mark (retroactive adjustment invalidates history). */
  def shouldFullRewrite(spark: SparkSession, lake: Lake): Boolean = {
    if (!Storage.tableExists(spark, lake.silver("daily_aggregates"))) return true
    val lastSilver = Storage.maxDate(spark, lake.silver("daily_aggregates"))
    lastSilver match {
      case None => true
      case Some(d) =>
        Storage.readTable(spark, lake.bronze("splits"))
          .filter(col("execution_date") > lit(java.sql.Date.valueOf(d)))
          .limit(1).count() > 0
    }
  }

  /** Silver: split-adjust, roll up to three grains, compute indicators.
    * Append path processes only bars newer than the checkpoint; rewrite
    * path rebuilds everything (same code, different input slice + mode). */
  def runSilver(spark: SparkSession, lake: Lake,
                clusteredFiles: Option[Int] =
                  sys.env.get("GRAFT_SILVER_CLUSTERED").map(_.trim.toInt)): Unit = {
    val full = shouldFullRewrite(spark, lake)
    val bronze = Storage.readTable(spark, lake.bronze("stocks"))
    val splits = Storage.readTable(spark, lake.bronze("splits"))

    val (input, mode) =
      if (full) (bronze, SaveMode.Overwrite)
      else {
        val last = Storage.maxDate(spark, lake.silver("daily_aggregates")).get
        (bronze.filter(col("date") > lit(java.sql.Date.valueOf(last))), SaveMode.Append)
      }

    // cast-validate on write (`schemas.py:108-117`): non-strict coercion to
    // the declared silver schema
    val daily = graft.functions.GraftFunctions.coerceTo(
      SilverOps.applySplits(input, splits), graft.Schemas.silverDaily)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Timing.stage("pipesub", "silver.daily")(
      Storage.writeTable(daily, lake.silver("daily_aggregates"), mode))

    // weekly/monthly + indicators always derive from the full silver daily
    // table (windows need history regardless of how much daily was new).
    // Cached: four derivations consume it, and re-reading means re-running
    // partition discovery + scan per consumer. On the full-rewrite path the
    // just-written table IS the computed frame, already cached by the write
    // above — reuse it instead of a read-back scan.
    val allDaily =
      if (full) daily
      else Storage.readTable(spark, lake.silver("daily_aggregates"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the weekly chain, monthly chain, and daily indicators are independent
    // consumers of the cached daily frame — submit them as CONCURRENT Spark
    // jobs (driver-side futures; executors interleave their tasks) instead
    // of serializing three small job waves. Each rollup feeds its aggregate
    // table AND its indicator table, so it is cached per grain.
    locally {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val grains = Seq(
        "week" -> ("weekly_aggregates", "weekly_indicators"),
        "month" -> ("monthly_aggregates", "monthly_indicators")).map {
        case (b, (aggT, indT)) => Future {
          val r = SilverOps.rollup(allDaily, b)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          Storage.writeTable(r, lake.silver(aggT))
          Storage.writeTable(SilverOps.indicators(r), lake.silver(indT))
          r.unpersist(false)
        }
      }
      // GRAFT_SILVER_CLUSTERED=<numFiles>: lay indicators out range-
      // clustered on ticker (narrow per-file key ranges → min/max-stat
      // pruning for the per-ticker reads gold and the catalog do).
      val dailyInd = Future {
        clusteredFiles match {
          case Some(n) => Storage.writeClustered(
            SilverOps.indicators(allDaily), lake.silver("daily_indicators"),
            clusterBy = Seq("ticker"), numFiles = n)
          case None => Storage.writeTable(
            SilverOps.indicators(allDaily), lake.silver("daily_indicators"))
        }
      }
      Timing.stage("pipesub", "silver.derived")(
        Await.result(Future.sequence(grains :+ dailyInd), Duration.Inf))
    }
    allDaily.unpersist(false)
    if (allDaily ne daily) daily.unpersist(false)

    if (full) Checkpoints.save(lake.checkpointPath,
      Checkpoints.load(lake.checkpointPath) +
        ("silver_last_full_rewrite" -> java.time.Instant.now().toString))
  }

  /** Gold: VWAP signals + HVC pattern tables off silver. */
  def runGold(spark: SparkSession, lake: Lake): Unit = {
    val daily = Storage.readTable(spark, lake.silver("daily_aggregates"))

    val ind = Storage.readTable(spark, lake.silver("daily_indicators"))
    // hvc feeds its own table plus both stair-pattern directions — cache it
    // so the indicator scan + HVC windows run once, not three times.
    val hvc = PatternOps.highVolumeCloses(ind, threshold = 1.5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize BEFORE the concurrent consumers fork (the caching
    // doctrine: an unmaterialized cache does not dedupe in-flight work)
    hvc.count()
    // the four gold tables are independent consumers of two cached/read
    // frames — submit them as CONCURRENT jobs (guide §2.6 "overlap
    // independent jobs": each write is a small job wave with a fixed
    // ~0.3-0.5 s commit tail; serialized, pipeline_full paid that tail
    // four times back-to-back while most cores idled — the silver stage's
    // derived writes already run this way)
    locally {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val writes = Seq(
        Future(Storage.writeTable(
          GoldOps.vwapSignals(daily), lake.gold("vwap_signals"))),
        Future(Storage.writeTable(hvc, lake.gold("daily_high_volume_closes"))),
        Future(Storage.writeTable(
          PatternOps.stairPatterns(hvc, ascending = true, minSteps = 2),
          lake.gold("stairstepping_patterns"))),
        Future(Storage.writeTable(
          PatternOps.bestPatternPerTicker(
            PatternOps.stairPatterns(hvc, ascending = false, minSteps = 2)),
          lake.gold("falling_down_stairs_summary"))))
      Timing.stage("pipesub", "gold.writes")(
        Await.result(Future.sequence(writes), Duration.Inf))
    }
    hvc.unpersist(false)
  }

  /** Clean: drop bronze (the reference's `clean` CLI). */
  def runClean(spark: SparkSession, lake: Lake): Unit = {
    Storage.deleteTable(spark, lake.bronze("stocks"))
    Storage.deleteTable(spark, lake.bronze("splits"))
  }

  def runAll(spark: SparkSession, sfDir: String, lake: Lake): Unit = {
    Timing.stage("pipeline", "bronze")(runBronze(spark, sfDir, lake))
    Timing.stage("pipeline", "silver")(runSilver(spark, lake))
    Timing.stage("pipeline", "gold")(runGold(spark, lake))
  }
}
