package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the most recent right row
  * with the same key and right-time ≤ left-time (SURVEY J2's "theta/as-of
  * flavored" shape promoted to a first-class operator — the time-series
  * join Polars ships as `join_asof` and DuckDB as `ASOF JOIN`).
  *
  * Spark-first composition (preference (a) in the builder brief — no custom
  * physical operator needed): tag both sides, union, and carry the latest
  * right values forward with `last(..., ignoreNulls)` over one
  * key-partitioned, time-ordered window. Exactly ONE shuffle on the key and
  * a single sort — the same cost as a sort-merge join, but produces the
  * as-of semantics directly. A right row tied on time sorts before the left
  * row, so equality matches (≤, not <).
  *
  * Requirements: right rows unique per (key, time); `valueCols` must not
  * collide with left column names.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, key: Seq[String],
           leftTime: String, rightTime: String,
           valueCols: Seq[String]): DataFrame =
    asOfImpl(left, right, key, leftTime, rightTime, valueCols, forward = false)

  /** Shared union+window composition; `forward` flips the sort direction,
    * the frame side, and the carrying aggregate — everything else
    * (tagging, union, carry-fold, projection) is direction-independent. */
  private def asOfImpl(left: DataFrame, right: DataFrame, key: Seq[String],
                       leftTime: String, rightTime: String,
                       valueCols: Seq[String], forward: Boolean): DataFrame = {
    val leftTagged = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
    val rightTagged = right
      .select((key.map(col) :+ col(rightTime).as("_t")) ++ valueCols.map(col): _*)
      .withColumn("_side", lit(0))
      .withColumn("_rt", col("_t"))

    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    // Forward is the SAME running-frame carry on a time-DESCENDING sort:
    // walking latest→earliest, "last right seen" is the smallest right time
    // ≥ the current row's. (A currentRow→unboundedFollowing frame would be
    // semantically equivalent but WindowExec re-aggregates such frames per
    // row — O(rows²) per key; the running frame is incremental.) Ties: the
    // right row sorts before the left row in traversal order either way, so
    // equality matches in both directions.
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(if (forward) col("_t").desc else col("_t").asc, col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = (valueCols :+ "_rt").foldLeft(unioned)((acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(w)))

    carried
      .filter(col("_side") === 1)
      .withColumnRenamed("_rt", "matched_time")
      .drop("_t", "_side")
  }

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * right-time ≥ left-time (Polars `join_asof(strategy="forward")`). Same
    * one-shuffle union composition as [[asOf]], mirrored: values are
    * carried backward with `first(..., ignoreNulls)` over the
    * currentRow→unboundedFollowing frame. At equal times the right row must
    * be visible to the left row's frame, so the right row (side 0) sorts
    * before the left row (side 1) — `_side` ascending, same as the backward
    * direction (see the tie note inside asOfImpl). */
  def asOfForward(left: DataFrame, right: DataFrame, key: Seq[String],
                  leftTime: String, rightTime: String,
                  valueCols: Seq[String]): DataFrame =
    asOfImpl(left, right, key, leftTime, rightTime, valueCols, forward = true)

  /** As-of with a tolerance: matches older than `tolerance` (in days, for
    * date keys) are nulled out — Polars `join_asof(tolerance=...)`. */
  def asOfWithTolerance(left: DataFrame, right: DataFrame, key: Seq[String],
                        leftTime: String, rightTime: String,
                        valueCols: Seq[String], toleranceDays: Int): DataFrame = {
    val joined = asOf(left, right, key, leftTime, rightTime, valueCols)
      .withColumn("_stale",
        datediff(col(leftTime), col("matched_time")) > toleranceDays)
    (valueCols :+ "matched_time").foldLeft(joined)((acc, c) =>
      acc.withColumn(c, when(col("_stale"), lit(null)).otherwise(col(c))))
      .drop("_stale")
  }
}
