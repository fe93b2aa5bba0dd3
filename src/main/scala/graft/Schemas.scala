package graft

import org.apache.spark.sql.types._

/** Declared table schemas (reference `schemas.py:12-102` — SURVEY §1.2).
  *
  * Validation = coercion: writes pass through [[graft.functions.GraftFunctions.coerceTo]]
  * (non-strict cast, bad values → null), exactly the reference's
  * `df.cast(schema, strict=False)`. Type mapping per SURVEY §1.2:
  * Categorical → String (parquet dictionary encoding covers the memory
  * win), UInt64 → Long, Float32 ingest widened to Double in silver.
  */
object Schemas {

  val silverDaily: StructType = StructType(Seq(
    StructField("ticker", StringType),
    StructField("date", DateType),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("volume", LongType),
    StructField("transactions", LongType)))

  val silverIndicators: StructType = StructType(
    silverDaily.fields.toSeq ++ Seq(
      StructField("prev_close", DoubleType),
      StructField("true_range", DoubleType),
      StructField("sma_20", DoubleType),
      StructField("sma_50", DoubleType),
      StructField("sma_200", DoubleType),
      StructField("atr_14", DoubleType),
      StructField("volume_ma_20", LongType),
      StructField("volume_ratio", DoubleType)))

  val splits: StructType = StructType(Seq(
    StructField("ticker", StringType),
    StructField("execution_date", DateType),
    StructField("split_from", DoubleType),
    StructField("split_to", DoubleType)))

  val goldVwap: StructType = StructType(Seq(
    StructField("ticker", StringType),
    StructField("date", DateType),
    StructField("year", IntegerType),
    StructField("quarter", IntegerType),
    StructField("close", DoubleType),
    StructField("volume", LongType),
    StructField("ytd_vwap", DoubleType),
    StructField("qtd_vwap", DoubleType),
    StructField("above_ytd_vwap", BooleanType),
    StructField("above_qtd_vwap", BooleanType),
    StructField("above_both", BooleanType)))
}
