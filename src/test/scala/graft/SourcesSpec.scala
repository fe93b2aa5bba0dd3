package graft

import graft.sources._
import graft.functions.TradingCalendar
import java.nio.file.Files
import java.time.LocalDate
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.types._
import scala.concurrent.ExecutionContext.Implicits.global

class SourcesSpec extends SparkSpecBase {

  test("normalizeEventTs maps both fixture ts encodings to the same instants") {
    // The driver's events fixture has shipped ts as int64 nanos AND as
    // timestamp[us] (TIMESTAMP_NTZ) across generations; round 5 broke when
    // only one was handled. Pin that both normalize to identical
    // session-zoned TimestampType instants, so the next encoding drift
    // fails here by name instead of at 3 queries' analysis time.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ts_enc").toString
    val micros = Seq(1700000000000000L, 1700003600500000L)
    micros.map(m => (1L, m * 1000L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/nanos")
    micros.map(m => (1L, m)).toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/ntz")
    val readBack = Seq(s"$dir/nanos", s"$dir/ntz").map { p =>
      val df = Tables.normalizeEventTs(spark.read.parquet(p))
      assert(df.schema("ts").dataType === TimestampType, p)
      df.select(unix_micros(col("ts"))).orderBy("ts")
        .collect().map(_.getLong(0)).toSeq
    }
    assert(readBack(0) === micros, "nanos encoding")
    assert(readBack(1) === micros, "ntz encoding")
  }

  test("missing-date planner: required minus stored, newest first") {
    val today = LocalDate.of(2024, 1, 31)
    val stored = Set(LocalDate.of(2024, 1, 2), LocalDate.of(2024, 1, 3))
    val missing = IngestPlanner.missingDates(2024, today, stored)
    assert(!missing.exists(stored))
    assert(missing.head === LocalDate.of(2024, 1, 31))
    assert(missing === missing.sortBy[Long](-_.toEpochDay))
    assert(missing.forall(TradingCalendar.isTradingDay))
  }

  test("parallel fetch stops scheduling after a plan-limit response") {
    val days = TradingCalendar.tradingDays(
      LocalDate.of(2024, 1, 1), LocalDate.of(2024, 2, 29))
    val dates = days.sortBy[Long](-_.toEpochDay)
    val quotaAt = dates(10) // 403 partway through the 3rd window of 4
    val src = new FixtureBarsSource(Seq("AAA", "BBB"), quotaDates = Set(quotaAt))
    val (rows, completed, hitLimit) = ParallelFetch.fetchAll(src, dates, parallelism = 4)
    assert(hitLimit)
    // everything before the quota window completed; nothing after the
    // cancelled window was ever launched
    assert(completed.size >= 10 && completed.size <= 12)
    assert(rows.size === completed.size * 2)
    val launchedWindows = (completed.size + 1) / 4 + 1
    assert(launchedWindows <= 4)
  }

  test("fetch-transform-write roundtrip lands in a date-partitioned table") {
    import scala.jdk.CollectionConverters._
    val src = new FixtureBarsSource(Seq("AAA", "BBB"))
    val days = TradingCalendar.tradingDays(
      LocalDate.of(2024, 3, 4), LocalDate.of(2024, 3, 8))
    val (rows, _, _) = ParallelFetch.fetchAll(src, days)
    val df = spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(
        r.ticker, java.sql.Date.valueOf(r.date), r.open, r.high, r.low,
        r.close, r.volume, r.transactions)).asJava,
      StructType(Seq(
        StructField("ticker", StringType), StructField("date", DateType),
        StructField("open", DoubleType), StructField("high", DoubleType),
        StructField("low", DoubleType), StructField("close", DoubleType),
        StructField("volume", LongType), StructField("transactions", LongType))))
    val ref = TableRef(Files.createTempDirectory("graft_src").toString, "bronze", "stocks")
    Storage.writeTable(df, ref, partitionBy = Seq("date"))
    val back = Storage.readTable(spark, ref)
    assert(back.count() === 10) // 5 trading days × 2 tickers
    assert(Storage.maxDate(spark, ref).contains(LocalDate.of(2024, 3, 8)))
  }

  test("storage: init, exists, delete, checkpoint roundtrip") {
    val root = Files.createTempDirectory("graft_store").toString
    val ref = TableRef(root, "silver", "t")
    val schema = StructType(Seq(StructField("a", IntegerType)))
    assert(!Storage.tableExists(spark, ref))
    Storage.initTable(spark, ref, schema)
    assert(Storage.tableExists(spark, ref))
    assert(Storage.readTable(spark, ref).count() === 0)
    assert(Storage.deleteTable(spark, ref))
    assert(!Storage.tableExists(spark, ref))

    val cp = s"$root/checkpoints.json"
    Checkpoints.save(cp, Map("k1" -> "v1", "weird" -> "a\"b\nc"))
    assert(Checkpoints.load(cp) === Map("k1" -> "v1", "weird" -> "a\"b\nc"))
    assert(Checkpoints.load(s"$root/nope.json") === Map.empty)
  }

  test("append mode is a real append (reference's append path raises)") {
    val ref = TableRef(Files.createTempDirectory("graft_app").toString, "silver", "t")
    import spark.implicits._
    Storage.writeTable(Seq(1, 2).toDF("a"), ref)
    Storage.writeTable(Seq(3).toDF("a"), ref, SaveMode.Append)
    assert(Storage.readTable(spark, ref).count() === 3)
  }

  test("partitioned tables: compact refuses, compactPartitions compacts each dir") {
    val ref = TableRef(Files.createTempDirectory("graft_cmpp").toString, "bronze", "t")
    val bars = Tables.bars(spark, sf).filter(org.apache.spark.sql.functions.col("ticker") < "T2")
    Storage.writeTable(bars.repartition(4), ref, partitionBy = Seq("ticker"))
    intercept[IllegalArgumentException](Storage.compact(spark, ref))
    val results = Storage.compactPartitions(spark, ref)
    assert(results.nonEmpty && results.values.forall(_ >= 1))
    val after = Storage.readTable(spark, ref)
    // partition column survives the per-dir rewrite and data is intact
    assert(after.columns.contains("ticker"))
    assert(after.count() === bars.count())
  }

  test("clustered write: each file covers a narrow key range; blooms accepted") {
    val ref = TableRef(Files.createTempDirectory("graft_clus").toString, "silver", "t")
    val bars = Tables.bars(spark, sf)
    Storage.writeClustered(bars, ref, Seq("ticker"), numFiles = 8,
      bloomFilterFor = Seq("ticker"))
    val files = new java.io.File(ref.path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length > 1)
    val total = bars.select("ticker").distinct().count()
    // narrow per-file ranges: every file holds well under the full
    // ticker universe (that's what makes min/max stats prune)
    files.foreach { f =>
      val d = spark.read.parquet(f).select("ticker").distinct().count()
      assert(d < total / 2, s"$f covers $d of $total tickers")
    }
    assert(Storage.readTable(spark, ref).count() === bars.count())
  }

  test("z-ordered write narrows per-file ranges on BOTH dimensions") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
    val zref = TableRef(Files.createTempDirectory("graft_zord").toString, "silver", "z")
    Storage.writeZOrdered(ev, zref, "user_id", "value", numFiles = 16)
    // baseline: 1-D clustering on user_id leaves the second dim unclustered
    val cref = TableRef(Files.createTempDirectory("graft_zord1d").toString, "silver", "c")
    Storage.writeClustered(ev, cref, Seq("user_id"), numFiles = 16)
    def avgSpanFraction(ref: TableRef, c: String): Double = {
      val g = Storage.readTable(spark, ref)
        .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).first()
      val span = g.getDouble(1) - g.getDouble(0)
      val files = new java.io.File(ref.path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      val fracs = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).first()
        (r.getDouble(1) - r.getDouble(0)) / span
      }
      fracs.sum / fracs.length
    }
    // z-order: both dims well under the full span per file
    assert(avgSpanFraction(zref, "user_id") < 0.5)
    assert(avgSpanFraction(zref, "value") < 0.5)
    // 1-D clustering: first dim narrow, second dim left wide — the z
    // layout must beat it on the dimension it ignores
    assert(avgSpanFraction(cref, "user_id") < 0.5)
    assert(avgSpanFraction(zref, "value") < avgSpanFraction(cref, "value") * 0.75)
    // layout change only — same rows
    assert(Storage.readTable(spark, zref).count() === ev.count())
  }

  test("compact bin-packs small files and preserves the data exactly") {
    val ref = TableRef(Files.createTempDirectory("graft_cmp").toString, "silver", "t")
    val bars = Tables.bars(spark, sf)
    Storage.writeTable(bars.repartition(16), ref)
    def files() = new java.io.File(ref.path).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files() === 16)
    val n = Storage.compact(spark, ref)
    assert(files() === n && n < 16)
    val after = Storage.readTable(spark, ref)
    assert(after.except(bars).count() === 0)
    assert(bars.except(after).count() === 0)
  }

  test("upsert replaces matched keys, inserts the rest") {
    import spark.implicits._
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "v", "x")
    val updates = Seq((2L, "B", 20.0), (9L, "Z", 90.0)).toDF("k", "v", "x")
    val out = graft.operators.MergeOps.upsert(base, updates, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out === Set((1L, "a", 1.0), (2L, "B", 20.0), (3L, "c", 3.0),
      (9L, "Z", 90.0)))
  }

  test("partitioned upsert rewrites only the touched partitions") {
    import spark.implicits._
    val ref = TableRef(Files.createTempDirectory("graft_ups").toString, "silver", "t")
    val base = Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-01", 2.0),
      (3L, "2024-01-02", 3.0)).toDF("k", "d", "x")
    base.write.partitionBy("d").parquet(ref.path)
    val untouchedFiles = new java.io.File(s"${ref.path}/d=2024-01-02")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val updates = Seq((2L, "2024-01-01", 20.0), (9L, "2024-01-01", 90.0))
      .toDF("k", "d", "x")
    graft.operators.MergeOps.upsertPartitioned(spark, ref, updates, Seq("k"), "d")
    val out = Storage.readTable(spark, ref)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(out === Set((1L, 1.0), (2L, 20.0), (3L, 3.0), (9L, 90.0)))
    // the 2024-01-02 partition's files were not rewritten
    val stillThere = new java.io.File(s"${ref.path}/d=2024-01-02")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(stillThere === untouchedFiles)
  }

  test("partitioned upsert over-cap fallback: same merge, semi-join scoping") {
    // VERDICT r10 #2: the touched-partition collect is capped like every
    // other driver pull. Past the cap the base scan is scoped by a
    // semi-join on the same distinct set — identical results and identical
    // untouched-partition preservation, exercised here by forcing the cap
    // to 1 with a 2-partition update batch.
    import spark.implicits._
    val ref = TableRef(Files.createTempDirectory("graft_ups_cap").toString,
      "silver", "t")
    val base = Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0),
      (3L, "2024-01-03", 3.0)).toDF("k", "d", "x")
    base.write.partitionBy("d").parquet(ref.path)
    val untouchedFiles = new java.io.File(s"${ref.path}/d=2024-01-03")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val updates = Seq((1L, "2024-01-01", 10.0), (9L, "2024-01-02", 90.0))
      .toDF("k", "d", "x")
    graft.operators.MergeOps.upsertPartitioned(spark, ref, updates, Seq("k"),
      "d", maxPushdownKeys = 1)
    val out = Storage.readTable(spark, ref)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(out === Set((1L, 10.0), (2L, 2.0), (3L, 3.0), (9L, 90.0)))
    val stillThere = new java.io.File(s"${ref.path}/d=2024-01-03")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(stillThere === untouchedFiles,
      "over-cap path must still leave untouched partitions' files alone")
  }

  test("partitioned upsert survives a session configured for STATIC overwrite") {
    // the writer pins partitionOverwriteMode=dynamic per-write; without the
    // pin, a static-mode session truncates the whole table path and every
    // untouched partition is silently lost
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try {
      val ref = TableRef(Files.createTempDirectory("graft_ups_static").toString,
        "silver", "t")
      Seq((1L, "2024-01-01", 1.0), (3L, "2024-01-02", 3.0)).toDF("k", "d", "x")
        .write.partitionBy("d").parquet(ref.path)
      val updates = Seq((1L, "2024-01-01", 10.0)).toDF("k", "d", "x")
      graft.operators.MergeOps.upsertPartitioned(spark, ref, updates, Seq("k"), "d")
      val out = Storage.readTable(spark, ref)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(out === Set((1L, 10.0), (3L, 3.0)),
        "untouched partition must survive a static-mode session")
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
  }

  test("dedup operators release their corpus-sized shingle caches") {
    val docs = Tables.documents(spark, sf).filter(
      org.apache.spark.sql.functions.col("doc_id") < 100)
    val before = spark.sparkContext.getPersistentRDDs.size
    val pairs = graft.operators.DedupOps.ngramJaccardPairs(docs)
    // only the small returned pair frame and its checkpointed candidate
    // backing may remain — the corpus-sized shingle rows must have been
    // unpersisted once the pairs materialized
    assert(spark.sparkContext.getPersistentRDDs.size <= before + 2,
      s"leaked caches: ${spark.sparkContext.getPersistentRDDs.size - before}")
    pairs.unpersist()
    assert(spark.sparkContext.getPersistentRDDs.size <= before + 1)
  }

  test("table checksum is layout-invariant but content-sensitive") {
    import graft.sources.Storage
    val cols = Seq("l_orderkey", "l_linenumber", "l_returnflag")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    def sums(df: org.apache.spark.sql.DataFrame) =
      Storage.tableChecksum(df, cols).first() match {
        // the window sums are decimal(38,0) — a long sum would silently
        // wrap past ~2^31 rows (each row contributes up to 2^32−1)
        case r => (r.getLong(0), r.getDecimal(1), r.getDecimal(2))
      }
    val base = sums(li)
    // any repartitioning / ordering of the same rows hashes identically
    assert(sums(li.repartition(13)) === base)
    assert(sums(li.orderBy(org.apache.spark.sql.functions.col("l_returnflag"))) === base)
    // one flipped value in one row changes the checksum (pick a REAL row)
    val first = li.select("l_orderkey", "l_linenumber")
      .orderBy("l_orderkey", "l_linenumber").first()
    val mutated = li.withColumn("l_returnflag",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("l_orderkey") === first.getLong(0) &&
          org.apache.spark.sql.functions.col("l_linenumber") === first.getInt(1),
        org.apache.spark.sql.functions.lit(""))
        .otherwise(org.apache.spark.sql.functions.col("l_returnflag")))
    val m = sums(mutated)
    assert(m._1 === base._1 && (m._2 != base._2 || m._3 != base._3),
      "a single mutated value must move the checksum")
  }

  test("schema-evolution read: appended columns merge, old rows null-fill") {
    import spark.implicits._
    val ref = TableRef(
      java.nio.file.Files.createTempDirectory("graft_evolve").toString,
      "silver", "evolving")
    Storage.writeTable(Seq((1L, "a"), (2L, "b")).toDF("id", "x"), ref)
    // a later producer gained a column; append, don't rewrite
    Seq((3L, "c", 9.5)).toDF("id", "x", "y").write
      .mode("append").parquet(ref.path)
    val merged = Storage.readTableMerged(spark, ref)
    assert(merged.columns.sorted.toSeq === Seq("id", "x", "y"))
    val rows = merged.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(rows === Map(1L -> None, 2L -> None, 3L -> Some(9.5)))
  }
}
