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

  /** The as-of join through the native Catalyst operator
    * ([[graft.plans.AsOfJoinNode]] → `AsOfJoinExec`): one hash exchange per
    * side, sort by (key, time), and a linear per-partition merge with O(1)
    * state — no window machinery at all. Same output contract as
    * [[asOf]]/[[asOfForward]] (value columns + `matched_time`), proven
    * row-identical by AsOfJoinSpec and the `q_asof_native` oracle.
    * Requires the session to carry [[graft.GraftExtensions]] (the default
    * builder does) so the planner knows the node. */
  def asOfNative(left: DataFrame, right: DataFrame, key: Seq[String],
                 leftTime: String, rightTime: String,
                 valueCols: Seq[String], forward: Boolean = false): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.graftshim.ColumnBridge
    val lPlan = ColumnBridge.analyzed(left)
    val rPlan0 = ColumnBridge.analyzed(right)
    // self-join shape: when the two sides share attribute ids the analyzer
    // would re-alias one child underneath us and orphan the captured refs —
    // mint fresh ids for the right side up front instead
    val rPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty) rPlan0
      else Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${p.output.map(_.name).mkString(", ")}"))
    // the right side's contract is fixed (keys + time + values) — project
    // it down immediately so the scan below never reads more columns
    val rNeeded = (key :+ rightTime) ++ valueCols
    val rPruned = Project(rNeeded.distinct.map(attr(rPlan, _)), rPlan)
    val rightValues = valueCols.map(attr(rPruned, _))
    val rTime = attr(rPruned, rightTime)
    val outAttrs = (rightValues.map(a =>
      AttributeReference(a.name, a.dataType, nullable = true)()) :+
      AttributeReference("matched_time", rTime.dataType, nullable = true)())
    ColumnBridge.ofRows(left.sparkSession, graft.plans.AsOfJoinNode(
      lPlan, rPruned,
      key.map(attr(lPlan, _)), key.map(attr(rPruned, _)),
      attr(lPlan, leftTime), rTime,
      rightValues :+ rTime, outAttrs, forward))
  }

  /** Nearest as-of join: for each left row, the right row minimizing
    * |left-time − right-time| (Polars `join_asof(strategy="nearest")`),
    * ties broken backward. BOTH directional carries run over ONE union and
    * one key exchange — the ascending and descending windows share the
    * hash partitioning, so Spark plans a single Exchange with two Sorts,
    * not two joins stitched together. The winner is chosen per row by
    * comparing epoch distances (dates carry no sub-day component, so any
    * engine's unit agrees on the comparison). Adds `matched_dir`
    * ('backward'/'forward'/NULL alongside `matched_time`). */
  def asOfNearest(left: DataFrame, right: DataFrame, key: Seq[String],
                  leftTime: String, rightTime: String,
                  valueCols: Seq[String]): DataFrame = {
    val leftTagged = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
    val rightTagged = right
      .select((key.map(col) :+ col(rightTime).as("_t")) ++ valueCols.map(col): _*)
      .withColumn("_side", lit(0))
      .withColumn("_rt", col("_t"))
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    val wB = Window.partitionBy(key.map(col): _*)
      .orderBy(col("_t").asc, col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(key.map(col): _*)
      .orderBy(col("_t").desc, col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = (valueCols :+ "_rt").foldLeft(unioned)((acc, c) =>
      acc.withColumn(s"_b_$c", last(col(c), ignoreNulls = true).over(wB))
        .withColumn(s"_f_$c", last(col(c), ignoreNulls = true).over(wF)))
    val eb = col("_b__rt").cast("timestamp").cast("long")
    val ef = col("_f__rt").cast("timestamp").cast("long")
    val et = col("_t").cast("timestamp").cast("long")
    val takeB = col("_b__rt").isNotNull &&
      (col("_f__rt").isNull || (et - eb) <= (ef - et))
    val chosen = valueCols.foldLeft(carried)((acc, c) =>
      acc.withColumn(c, when(takeB, col(s"_b_$c")).otherwise(col(s"_f_$c"))))
      .withColumn("matched_time",
        when(takeB, col("_b__rt")).otherwise(col("_f__rt")))
      .withColumn("matched_dir",
        when(takeB, lit("backward"))
          .when(col("_f__rt").isNotNull, lit("forward")))
    chosen
      .filter(col("_side") === 1)
      .drop((valueCols.map("_b_" + _) ++ valueCols.map("_f_" + _) ++
        Seq("_b__rt", "_f__rt", "_rt", "_t", "_side")): _*)
  }

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
