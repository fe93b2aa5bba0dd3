package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets

/** Copy-on-write table versioning with time-travel reads — the Delta/
  * Iceberg snapshot idea expressed as plain parquet + a pointer file.
  *
  * Layout: `ref.path/v_N/` holds version N's full data; `ref.path/_HEAD`
  * holds the current version number. A commit writes the new version dir
  * FIRST and moves the pointer LAST via a checked rename (the
  * [[Storage.compact]] swap discipline), so a reader always resolves
  * either the old head or the new one — never a torn table. Old versions
  * stay readable until [[vacuum]] drops them.
  *
  * Scale honesty: each commit copies the full table, which is the right
  * trade for silver/gold-sized curated tables (the reference rewrites its
  * silver layer wholesale anyway). For a 100 TB fact table the unit of
  * copy-on-write must drop to the partition/file level with a manifest
  * per snapshot (what Delta's transaction log does); this module's
  * contract — monotone versions, pointer-last commit, pinned reads,
  * diffable snapshots — is the part that carries over unchanged.
  */
object Snapshots {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def headPath(ref: TableRef) = new Path(s"${ref.path}/_HEAD")
  private def verPath(ref: TableRef, v: Long) = s"${ref.path}/v_$v"

  /** Current head version, if any commit has completed. */
  def head(spark: SparkSession, ref: TableRef): Option[Long] = {
    val f = fs(spark, ref.path)
    val p = headPath(ref)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val buf = new Array[Byte](64)
        val n = in.read(buf)
        Some(new String(buf, 0, math.max(n, 0),
          StandardCharsets.UTF_8).trim.toLong)
      } finally in.close()
    }
  }

  /** All committed versions present on disk, ascending. */
  def versions(spark: SparkSession, ref: TableRef): Seq[Long] = {
    val f = fs(spark, ref.path)
    val root = new Path(ref.path)
    if (!f.exists(root)) Nil
    else {
      // read the pointer ONCE — inside the filter it re-opened _HEAD per
      // version directory (N+1 metadata round-trips on an object store)
      val h = head(spark, ref)
      f.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("v_"))
        .map(_.getPath.getName.stripPrefix("v_").toLong)
        .filter(v => h.exists(v <= _)) // ignore torn writes past head
        .sorted
    }
  }

  /** Commit `df` as the next version; returns the new version number.
    * Data lands fully before the pointer moves (write `_HEAD` to a hidden
    * temp, checked-rename over the old pointer — rename replaces
    * atomically on HDFS-like stores and this module's posix tests). */
  def commit(df: DataFrame, ref: TableRef): Long = {
    val spark = df.sparkSession
    val next = head(spark, ref).getOrElse(0L) + 1L
    df.write.mode(SaveMode.Overwrite).option("compression", "zstd")
      .parquet(verPath(ref, next))
    val f = fs(spark, ref.path)
    val tmp = new Path(s"${ref.path}/._HEAD_tmp")
    if (f.exists(tmp)) f.delete(tmp, false)
    val out = f.create(tmp, true)
    try out.write(next.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val hp = headPath(ref)
    if (f.exists(hp)) f.delete(hp, false)
    if (!f.rename(tmp, hp))
      throw new IllegalStateException(s"snapshot commit: pointer move failed for $ref")
    next
  }

  /** Read the head version, or a pinned historical one (time travel). */
  def read(spark: SparkSession, ref: TableRef,
           version: Option[Long] = None): DataFrame = {
    val h = head(spark, ref)
    val v = version.orElse(h).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at ${ref.path}"))
    require(version.forall(pin => h.exists(_ >= pin)),
      s"snapshot v$v is past the committed head at ${ref.path}")
    spark.read.parquet(verPath(ref, v))
  }

  /** Row-level diff between two snapshots: full-row set difference, each
    * row tagged '+' (present in `to`, not in `from`) or '-' (removed).
    * Two except-alls — the CDC a consumer replays to move from one
    * version to the next without rereading the table. */
  def diff(spark: SparkSession, ref: TableRef, from: Long, to: Long): DataFrame = {
    val a = read(spark, ref, Some(from))
    val b = read(spark, ref, Some(to))
    b.exceptAll(a).withColumn("change", lit("+"))
      .unionByName(a.exceptAll(b).withColumn("change", lit("-")))
  }

  /** Roll back by committing version `to`'s data as a NEW head version —
    * history stays linear and append-only (a pointer-only rollback would
    * orphan the skipped versions' lineage). */
  def rollback(spark: SparkSession, ref: TableRef, to: Long): Long =
    commit(read(spark, ref, Some(to)), ref)

  /** Drop all versions strictly older than `keepFrom`. Readers pinned to
    * vacuumed versions fail fast thereafter — the standard retention
    * contract. */
  def vacuum(spark: SparkSession, ref: TableRef, keepFrom: Long): Int = {
    val f = fs(spark, ref.path)
    val drop = versions(spark, ref).filter(_ < keepFrom)
    drop.foreach(v => f.delete(new Path(verPath(ref, v)), true))
    drop.size
  }
}
