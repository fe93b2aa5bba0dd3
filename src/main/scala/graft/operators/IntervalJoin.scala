package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join as a library operator (the generalization behind
  * `q_interval_overlap`): pairs of rows whose [start, end] date intervals
  * overlap, computed scale-safely.
  *
  * The naive phrasing is a theta join (`a.start <= b.end AND b.start <=
  * a.end`) — a broadcast nested loop at best and a cartesian shuffle at
  * worst. Here each interval explodes to the calendar bins it covers, the
  * candidate join is a plain shuffle hash join on the bin key, the exact
  * overlap predicate filters, and DISTINCT collapses pairs sharing several
  * bins. At 100 TB that is |rows|·spanBins shuffled rows instead of an
  * O(n²) comparison space.
  *
  * Bin grain: pass "week"/"month"/"quarter"/"year", or leave "auto" to pick
  * from the median interval span (sampled) — bins much smaller than the
  * span multiply candidate rows; bins much larger stop pruning.
  */
object IntervalJoin {

  private val grains = Seq(
    "week" -> 7.0, "month" -> 30.0, "quarter" -> 91.0, "year" -> 365.0)

  private def step(grain: String): String = grain match {
    case "week"    => "interval 7 days"
    case "quarter" => "interval 3 months" // no `quarter` interval literal
    case g         => s"interval 1 $g"
  }

  /** All overlapping pairs with the overlap length in days. Both inputs
    * need the same (`keyCol`, `startCol`, `endCol`) column names.
    *
    * Self-join mode — each unordered pair emitted once (`key_a < key_b`) —
    * is AUTO-DETECTED (`left eq right`) when `self` is left at `None`;
    * genuinely distinct inputs then keep ALL overlapping (a, b)
    * combinations, where the self-mode key ordering would silently drop
    * every overlap whose left key sorts ≥ its right key. Pass
    * `Some(true)`/`Some(false)` only to override the detection (e.g. a
    * re-read of the same table under two plans). */
  def overlapPairs(left: DataFrame, right: DataFrame,
                   keyCol: String, startCol: String, endCol: String,
                   grain: String = "auto",
                   self: Option[Boolean] = None): DataFrame = {
    require(grain == "auto" || grains.exists(_._1 == grain),
      s"bin grain must be auto|${grains.map(_._1).mkString("|")}, got $grain")
    val g = if (grain != "auto") grain else {
      val span = left.select(
        datediff(col(endCol), col(startCol)).cast("double").as("s"))
      val med = span.stat.approxQuantile("s", Array(0.5), 0.05).head
      grains.minBy { case (_, days) => math.abs(days - math.max(med, 1.0)) }._1
    }
    def binned(df: DataFrame, pfx: String) = df.select(
        col(keyCol).as(s"key_$pfx"),
        col(startCol).cast("date").as(s"ds_$pfx"),
        col(endCol).cast("date").as(s"de_$pfx"))
      .withColumn(s"bin_$pfx", explode(expr(
        s"sequence(${trunced(g, s"ds_$pfx")}, ${trunced(g, s"de_$pfx")}, ${step(g)})")))
    val a = binned(left, "a")
    val b = binned(right, "b")
    val pairPred =
      if (self.getOrElse(left eq right)) col("key_a") < col("key_b")
      else lit(true)
    a.join(b, col("bin_a") === col("bin_b") && pairPred &&
        col("ds_a") <= col("de_b") && col("ds_b") <= col("de_a"))
      .select(col("key_a"), col("key_b"),
        (datediff(least(col("de_a"), col("de_b")),
          greatest(col("ds_a"), col("ds_b"))) + lit(1)).as("overlap_days"))
      .distinct()
  }

  // SQL-text fragment for the sequence() bounds (trunc as SQL because the
  // sequence step must be an interval literal inside expr()).
  private def trunced(grain: String, c: String): String = grain match {
    case "week"    => s"date_sub($c, dayofweek($c) - 1)"
    case "month"   => s"trunc($c, 'MM')"
    case "quarter" => s"trunc($c, 'QUARTER')"
    case "year"    => s"trunc($c, 'YYYY')"
  }
}
