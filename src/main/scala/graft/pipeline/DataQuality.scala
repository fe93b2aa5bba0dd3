package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectation suite — the dbt-test /
  * Great-Expectations layer over lake tables (reference analogue: the
  * per-ingest anomaly thresholds in `silver/main.py`'s validation pass,
  * generalized to a whole-catalog report).
  *
  * Two check shapes, chosen by their scale cost:
  *  - [[rowChecks]]: ANY number of per-row predicates over one table
  *    collapse into a SINGLE scan — each check is a conditional count in
  *    one map-combined aggregate, then the 1×N result row unpivots to
  *    (check, violations) rows. Adding a check to a table is free (no new
  *    pass over 100 TB).
  *  - [[orphanCheck]]: referential integrity needs the other table — a
  *    left-anti join counted. The child side shuffles on the FK once; the
  *    parent key column is all that's read from the parent.
  *
  * The report is a union of tiny (≤ checks-per-table rows) aggregates —
  * driver-safe regardless of input size.
  */
object DataQuality {

  /** One scan, many expectations: `checks` maps check-name → violation
    * predicate. Output: (tbl, chk, violations) — one row per check. */
  def rowChecks(df: DataFrame, table: String,
                checks: Seq[(String, Column)]): DataFrame = {
    val counted = df.agg(
      count(when(checks.head._2, lit(1))).as(checks.head._1),
      checks.tail.map { case (name, pred) =>
        count(when(pred, lit(1))).as(name) }: _*)
    val stacked = checks.map { case (name, _) =>
      s"'$name', `$name`" }.mkString(", ")
    counted.select(lit(table).as("tbl"),
      expr(s"stack(${checks.size}, $stacked) AS (chk, violations)"))
      .select(col("tbl"), col("chk"), col("violations"))
  }

  /** FK orphan count: child rows whose `fkCol` has no match in
    * `parent.pkCol` (null FKs are not orphans — flag those with a
    * dedicated null-check if nulls are illegal). */
  def orphanCheck(child: DataFrame, childTable: String, fkCol: String,
                  parent: DataFrame, pkCol: String): DataFrame =
    child.filter(col(fkCol).isNotNull)
      .join(parent.select(col(pkCol).as(fkCol)), Seq(fkCol), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(childTable).as("tbl"),
        lit(s"orphan_$fkCol").as("chk"), col("violations"))

  /** Duplicate-key count: rows beyond the first per key value. */
  def dupCheck(df: DataFrame, table: String, keyCols: Seq[String]): DataFrame =
    df.agg((count(lit(1)) -
        count_distinct(keyCols.map(col).head, keyCols.map(col).tail: _*))
        .as("violations"))
      .select(lit(table).as("tbl"),
        lit(s"dup_${keyCols.mkString("_")}").as("chk"), col("violations"))

  /** Union the per-table/per-shape fragments into one report. */
  def report(fragments: DataFrame*): DataFrame =
    fragments.reduce(_ unionByName _)
}
