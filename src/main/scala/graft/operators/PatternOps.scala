package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declared gold query surface: high-volume closes and consecutive-pattern
  * mining (reference `metadata.json:9-578` — SURVEY W9/F12, §2.11).
  *
  * The pattern tables have no reference implementation, only declared
  * output schemas; semantics are fixed here per the column descriptions
  * (≥3 consecutive steps, best-pattern-per-ticker) and locked with fixtures.
  *
  * Scale: gaps-and-islands is two window passes over the same
  * ticker-partitioned sort plus one aggregate — HVC rows are a small
  * filtered subset of bars (volume ≥ 3× the 20-period average), so the
  * island aggregate runs on ~1% of the input.
  */
object PatternOps {

  /** High-volume closes: bars whose volume is ≥ `threshold`× the 20-period
    * moving average (`metadata.json:11`). Input must carry `volume_ratio`
    * (from [[SilverOps.indicators]] at the desired grain). */
  def highVolumeCloses(indicators: DataFrame, threshold: Double = 3.0): DataFrame =
    indicators
      .filter(col("volume_ratio").isNotNull && col("volume_ratio") >= threshold)
      .select(col("ticker"), col("date"), col("close"), col("volume"),
        col("volume_ma_20"), col("volume_ratio"))

  /** Gaps-and-islands: maximal runs of consecutive HVCs moving in one
    * direction (`ascending` → stair-stepping, else falling-down-stairs).
    *
    * Direction compares each HVC close with the previous HVC close of the
    * same ticker; a direction break (or first row) starts a new island
    * (running sum of break flags = island id). Runs shorter than `minSteps`
    * (`metadata.json:206`: 3) are dropped.
    *
    * Output: one row per pattern with date span, step count, close span,
    * gain %, and the comma-joined per-step dates/closes strings the
    * Datasette surface declares (`metadata.json:237-248`).
    */
  def stairPatterns(hvc: DataFrame, ascending: Boolean, minSteps: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("date"))
    val stepUp = col("close") > col("prev_close")
    val continues = if (ascending) stepUp else !stepUp

    val islands = hvc
      .withColumn("prev_close", lag(col("close"), 1).over(w))
      .withColumn("brk",
        when(col("prev_close").isNull || !continues, 1).otherwise(0))
      .withColumn("island", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    islands
      .groupBy(col("ticker"), col("island"))
      .agg(
        count(lit(1)).as("hvc_count"),
        min(col("date")).as("start_date"),
        max(col("date")).as("end_date"),
        min_by(col("close"), col("date")).as("first_close"),
        max_by(col("close"), col("date")).as("last_close"),
        concat_ws(",", transform(array_sort(collect_list(struct(col("date"), col("close")))),
          x => date_format(x("date"), "yyyy-MM-dd"))).as("dates_str"),
        concat_ws(",", transform(array_sort(collect_list(struct(col("date"), col("close")))),
          // 2-decimal formatting: prices are 2-decimal quantities, and a
          // fixed scale keeps the string form engine-independent.
          x => x("close").cast(org.apache.spark.sql.types.DecimalType(18, 2)).cast("string")))
          .as("closes_str"))
      .filter(col("hvc_count") >= minSteps)
      .withColumn("gain_pct",
        (col("last_close").cast("double") / col("first_close").cast("double") - 1.0) * 100.0)
      .drop("island")
  }

  /** Enrich patterns with the live-market columns the declared catalog
    * reads (`metadata.json`: `latest_close`, `price_change_since_pct` /
    * `change_since_pct`, `above_pattern_high` / `still_trending`,
    * `days_since_pattern`). No reference implementation exists — semantics
    * are fixed here from the column descriptions:
    *  - `latest_close`: the ticker's most recent close in `daily`;
    *  - `change_since_pct`: % move from the pattern's last close to latest;
    *  - trending flag (INT, catalog filters `= 1`): rising patterns —
    *    latest close above the pattern high; falling — below the pattern low
    *    (both are `last_close`, the run's final step);
    *  - `days_since_pattern`: days from pattern end to the table's as-of
    *    date (global max date — consistent snapshot, not wall clock).
    *
    * One broadcast-size agg (per-ticker latest) joined back on ticker plus
    * one scalar as-of — patterns are a tiny filtered subset, so this is
    * dim-table work at any scale. */
  def enrichPatterns(patterns: DataFrame, daily: DataFrame,
                     rising: Boolean): DataFrame = {
    val latest = daily.groupBy(col("ticker"))
      .agg(max_by(col("close"), col("date")).as("latest_close"))
    val asOf = daily.agg(max(col("date")).as("as_of"))
    val trending =
      if (rising) col("latest_close") > col("last_close")
      else col("latest_close") < col("last_close")
    patterns
      .join(latest, Seq("ticker"))
      .crossJoin(broadcast(asOf))
      .withColumn("change_since_pct",
        (col("latest_close").cast("double") / col("last_close").cast("double") - 1.0) * 100.0)
      .withColumn("trending_flag", trending.cast("int"))
      .withColumn("days_since_pattern", datediff(col("as_of"), col("end_date")))
      .drop("as_of")
  }

  /** Best pattern per ticker (`metadata.json:335-338`): longest run, ties
    * broken by most recent end date — deterministic ranking. */
  def bestPatternPerTicker(patterns: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker"))
      .orderBy(col("hvc_count").desc, col("end_date").desc, col("start_date").desc)
    patterns
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }
}
