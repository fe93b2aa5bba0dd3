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
  /** events.ts is TIMESTAMP(NANOS) in the fixture; Spark reads it as a long
    * (nanosAsLong) — truncate to micros for a proper TimestampType, which is
    * exactly what DuckDB's ns→µs timestamp cast does. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer division: ns values overflow double precision, so a
        // float-division-then-cast would be off by ±1µs
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
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
