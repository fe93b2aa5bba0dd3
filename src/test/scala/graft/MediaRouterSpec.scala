package graft

import graft.operators.MediaRouter
import org.apache.spark.sql.functions._

class MediaRouterSpec extends SparkSpecBase {
  import spark.implicits._

  test("sniffer routes every format the repo writes, by magic alone") {
    val docs = Tables.documents(spark, sf).limit(90)
    val got = MediaRouter.encodeMixed(docs)
      .select(col("doc_id"), MediaRouter.sniffFormat(col("payload"))
        .as("format"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = Seq("bmp", "png", "jpeg", "gif", "wav", "mp3", "mp4",
      "pdf", "warc_gz")
    got.foreach { case (id, fmt) =>
      assert(fmt === expect((id % 9).toInt), s"doc $id")
    }
    assert(got.values.toSet === expect.toSet, "all nine formats present")
  }

  test("junk and short payloads sniff as unknown, never crash") {
    val junk = Seq(
      (1L, "not a media file".getBytes("UTF-8")),
      (2L, Array[Byte](0x00)),
      (3L, Array.empty[Byte])).toDF("doc_id", "payload")
    val got = junk.select(MediaRouter.sniffFormat(col("payload")))
      .collect().map(_.getString(0))
    assert(got.forall(_ == "unknown"))
  }

  test("routeUnits accepts a custom id column name (ADVICE r10)") {
    val docs = Tables.documents(spark, sf).limit(18)
    val renamed = MediaRouter.encodeMixed(docs)
      .withColumnRenamed("doc_id", "asset_id")
    val got = MediaRouter.routeUnits(renamed, idCol = "asset_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size === 18, "one row per doc under a custom id name")
    val viaDefault = MediaRouter.routeUnits(MediaRouter.encodeMixed(docs))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === viaDefault, "custom idCol must not change the routing")
  }

  test("routeUnits dispatches every doc to its parser and normalizes") {
    val docs = Tables.documents(spark, sf).limit(90)
    val got = MediaRouter.routeUnits(MediaRouter.encodeMixed(docs))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(got.size === 90, "one row per doc — nothing dropped or doubled")
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case (id, (fmt, units)) =>
      val expect: Long = (id % 9) match {
        case 0 | 1 | 3 => (4 + id % 5) * (4 + id % 3)
        case 2 => 8 * (1 + id % 3) * 8 * (1 + id % 2)
        case 4 => 32 + id % 17
        case 5 => 2 + id % 7
        case 6 => (3 + id % 10) * (600 * (1 + id % 4)) + (id % 7) * 30
        case 7 => math.max(1,
          (texts(id).getBytes("UTF-8").length + 255) / 256).toLong
        case _ => 2L
      }
      assert(units === expect, s"doc $id ($fmt)")
    }
  }

  test("routeUnits accounts for unknown payloads instead of dropping them") {
    val mixed = MediaRouter.encodeMixed(Tables.documents(spark, sf).limit(18))
      .unionByName(Seq((900L, "junk bytes".getBytes("UTF-8")))
        .toDF("doc_id", "payload"))
    val got = MediaRouter.routeUnits(mixed)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(got.size === 19, "nothing dropped")
    assert(got(900L) === (("unknown", 10L)))
  }

  test("the sniff projection plans with no exchange and no UDF") {
    val docs = Tables.documents(spark, sf)
    val plan = MediaRouter.encodeMixed(docs)
      .select(MediaRouter.sniffFormat(col("payload")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
