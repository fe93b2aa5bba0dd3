package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the shared test fixtures (`TESTDATA.md`) plus the canonical
  * "bars" mapping used to exercise the reference's stock-market semantics
  * (reference data model: rows keyed `(ticker, date)` — see SURVEY §1.1).
  *
  * The fixtures are TPC-H-ish; the reference domain is OHLCV time series.
  * `bars` adapts one to the other deterministically (order-independent
  * aggregates only, so Spark and the DuckDB oracle agree bit-for-bit):
  * ticker := part key, date := ship date, prices from extended price,
  * volume from quantity.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  /** The fixture's `ts` encoding has drifted across driver generations:
    * TIMESTAMP(NANOS) (read as long under nanosAsLong), then timestamp[us]
    * without UTC adjustment (read as TIMESTAMP_NTZ). Normalize every
    * encoding to a session-zoned TimestampType so downstream epoch
    * arithmetic (`unix_millis` et al.) analyzes regardless of which
    * generation wrote the file. The session TZ is UTC (GraftSession), so
    * the NTZ→TZ cast is a lossless relabel, matching DuckDB's treatment of
    * the same column as a plain TIMESTAMP. */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeEventTs(table(spark, sfDir, "events"))

  /** Shared ts normalization for batch and streaming event readers. */
  def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // int64 nanos: integer division — ns values overflow double
        // precision, so a float-division-then-cast would be off by ±1µs
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** Canonical daily OHLCV bars derived from lineitem.
    *
    * One row per (ticker, date); every aggregate is order-independent
    * (min/max/count, and sums of integral-valued doubles), so results are
    * deterministic across engines. At scale this is a single hash aggregate
    * shuffled on the group keys — the same shape as the reference's
    * bronze→silver daily roll-up.
    */
  def bars(spark: SparkSession, sfDir: String): DataFrame =
    lineitem(spark, sfDir)
      .groupBy(
        concat(lit("T"), col("l_partkey") % 100).as("ticker"),
        to_date(col("l_shipdate")).as("date"))
      .agg(
        min(col("l_extendedprice")).as("open"),
        max(col("l_extendedprice")).as("high"),
        min(col("l_extendedprice")).as("low"),
        max(col("l_extendedprice")).as("close"),
        sum(col("l_quantity")).cast("long").as("volume"),
        count(lit(1)).as("transactions"))

  /** DuckDB CTE text equivalent of [[bars]] — prepend to oracle SQL. */
  val barsSql: String =
    """WITH bars AS (
      |  SELECT 'T' || (l_partkey % 100) AS ticker,
      |         CAST(l_shipdate AS DATE) AS date,
      |         MIN(l_extendedprice) AS open,
      |         MAX(l_extendedprice) AS high,
      |         MIN(l_extendedprice) AS low,
      |         MAX(l_extendedprice) AS close,
      |         CAST(SUM(l_quantity) AS BIGINT) AS volume,
      |         COUNT(*) AS transactions
      |  FROM lineitem
      |  GROUP BY 1, 2
      |)""".stripMargin
}
