package graft.operators

import graft.sources.{Storage, TableRef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Key-based MERGE (upsert) semantics over plain parquet tables — the
  * lakehouse primitive the reference approximates by rewriting whole
  * datasets (reference `bronze/main.py:249-253` read-concat-rewrite, and
  * the keep-last dedup in `bronze/splits.py:45`).
  *
  * Scale design (100 TB): `upsert` is one anti-join (shuffle on the merge
  * key) plus a union — no driver-side state, no full-table rewrite of the
  * unmatched side's data paths when the base is date-partitioned and
  * `upsertPartitioned` narrows the rewrite to the partitions the updates
  * actually touch (everything else is untouched files).
  */
object MergeOps {

  /** MERGE: rows of `updates` replace same-key rows of `base`; update rows
    * with no base match are inserted. Last-writer-wins within `updates` is
    * the caller's concern (dedup first if the batch can self-conflict). */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    base.join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates)

  /** MERGE into a stored table, rewriting only the hive partitions that
    * `updates` touches (dynamic partition overwrite). The merge itself is
    * scoped: base rows from untouched partitions never enter the join —
    * the touched partition VALUES (bounded by the batch's distinct
    * partition keys, driver-safe by construction) ride into the plan as an
    * isin literal, so the base scan is STATICALLY partition-pruned: bytes
    * read per merge is O(touched partitions) without relying on runtime
    * DPP filter insertion. */
  def upsertPartitioned(spark: SparkSession, ref: TableRef, updates: DataFrame,
                        keys: Seq[String], partitionCol: String): Unit = {
    val touched = updates.select(col(partitionCol)).distinct()
      .collect().map(_.get(0)).toIndexedSeq
    val base = Storage.readTable(spark, ref)
      .filter(col(partitionCol).isin(touched: _*))
    val merged = upsert(base, updates, keys)
      .repartition(col(partitionCol))
    merged.write
      // per-write option, NOT the session conf: on a session without
      // spark.sql.sources.partitionOverwriteMode=dynamic, a static
      // Overwrite+partitionBy truncates the whole table path first —
      // silently destroying every partition the updates didn't touch
      .option("partitionOverwriteMode", "dynamic")
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(ref.path)
  }
}
