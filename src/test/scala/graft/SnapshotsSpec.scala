package graft

import graft.sources.{Snapshots, TableRef}
import org.apache.spark.sql.functions._

import java.nio.file.Files

class SnapshotsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ref() =
    TableRef(Files.createTempDirectory("graft_snap").toString, "gold", "t")

  test("commit/read: head advances, pinned reads time-travel") {
    val r = ref()
    assert(Snapshots.head(spark, r) === None)
    val v1 = Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "x"), r)
    val v2 = Snapshots.commit(Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "x"), r)
    assert((v1, v2) === ((1L, 2L)))
    assert(Snapshots.head(spark, r) === Some(2L))
    assert(Snapshots.versions(spark, r) === Seq(1L, 2L))
    assert(Snapshots.read(spark, r).count() === 3L)           // head
    assert(Snapshots.read(spark, r, Some(1L)).count() === 2L) // pinned
    intercept[IllegalArgumentException] {
      Snapshots.read(spark, r, Some(9L))
    }
  }

  test("diff: row-level CDC between versions; rollback commits forward") {
    val r = ref()
    Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "x"), r)
    Snapshots.commit(Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "x"), r)
    val d = Snapshots.diff(spark, r, 1L, 2L).collect()
      .map(row => (row.getLong(0), row.getString(1), row.getString(2))).toSet
    assert(d === Set((2L, "B", "+"), (3L, "c", "+"), (2L, "b", "-")))
    // rollback to v1 = a NEW version with v1's content; history is linear
    val v3 = Snapshots.rollback(spark, r, 1L)
    assert(v3 === 3L)
    assert(Snapshots.read(spark, r).collect().map(_.getLong(0)).sorted
      === Array(1L, 2L))
    assert(Snapshots.diff(spark, r, 1L, 3L).count() === 0L) // identical
  }

  test("vacuum drops old versions; torn data dir past head is invisible") {
    val r = ref()
    (1 to 3).foreach(i => Snapshots.commit(Seq((i.toLong, "v")).toDF("id", "x"), r))
    assert(Snapshots.vacuum(spark, r, keepFrom = 3L) === 2)
    assert(Snapshots.versions(spark, r) === Seq(3L))
    assert(Snapshots.read(spark, r).count() === 1L)
    // simulate a crashed commit: data dir exists, pointer never moved
    Seq((99L, "torn")).toDF("id", "x").write.parquet(s"${r.path}/v_4")
    assert(Snapshots.head(spark, r) === Some(3L))
    assert(Snapshots.versions(spark, r) === Seq(3L)) // torn dir ignored
    // the next commit REUSES v4: overwrite replaces the torn write
    val v = Snapshots.commit(Seq((4L, "ok")).toDF("id", "x"), r)
    assert(v === 4L)
    assert(Snapshots.read(spark, r).collect().map(_.getLong(0)).toSeq === Seq(4L))
  }
}
