package graft.operators

import graft.functions.{GraftFunctions => F}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Gold-layer analytics: anchored-VWAP signals
  * (reference `gold/vwap_signals.py:25-177` — SURVEY §3.3).
  *
  * Plan shape: scan → narrow filter/project → ONE shuffle on the window
  * partition keys → two window passes sharing the (ticker, year[, quarter])
  * sort → narrow math → result. The quarter window is a sub-partition of the
  * year window, so Spark reuses the exchange; at 100 TB this is a single
  * hash-partitioned pass over the fact table.
  */
object GoldOps {

  private val D2 = DecimalType(18, 2)

  /** W5/W6 + F4/F8/F9 — YTD and QTD volume-weighted average price plus
    * above-VWAP boolean signals.
    *
    * Determinism: price·volume is accumulated in DECIMAL (exact,
    * order-independent); the VWAP division happens in double on identical
    * operands, so results are bit-identical across engines.
    */
  def vwapSignals(daily: DataFrame): DataFrame = {
    val base = daily
      .filter(col("close").isNotNull && col("volume") > 0)
      .select(col("ticker"), col("date"), col("close"), col("volume"))
      .withColumn("year", year(col("date")))
      .withColumn("quarter", quarter(col("date")))
      .withColumn("pv", col("close").cast(D2) * col("volume"))

    val wY = F.tickerWindow(Seq("ticker", "year"))
    val wQ = F.tickerWindow(Seq("ticker", "year", "quarter"))

    base
      .withColumn("cum_pv_ytd", F.cumSum(col("pv"), wY))
      .withColumn("cum_vol_ytd", F.cumSum(col("volume"), wY))
      .withColumn("cum_pv_qtd", F.cumSum(col("pv"), wQ))
      .withColumn("cum_vol_qtd", F.cumSum(col("volume"), wQ))
      .withColumn("ytd_vwap",
        col("cum_pv_ytd").cast("double") / col("cum_vol_ytd").cast("double"))
      .withColumn("qtd_vwap",
        col("cum_pv_qtd").cast("double") / col("cum_vol_qtd").cast("double"))
      .withColumn("above_ytd_vwap", col("close") > col("ytd_vwap"))
      .withColumn("above_qtd_vwap", col("close") > col("qtd_vwap"))
      .withColumn("above_both", col("above_ytd_vwap") && col("above_qtd_vwap"))
      .select("ticker", "date", "year", "quarter", "close", "volume",
        "ytd_vwap", "qtd_vwap", "above_ytd_vwap", "above_qtd_vwap", "above_both")
  }
}
