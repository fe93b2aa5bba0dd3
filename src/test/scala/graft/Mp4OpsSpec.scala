package graft

import graft.operators.Mp4Ops
import org.apache.spark.sql.functions._

class Mp4OpsSpec extends SparkSpecBase {
  import spark.implicits._

  // every timescale (id%4), every track count (id%3), both parities
  private def corpus = Seq(0L, 1L, 2L, 3L, 5L, 10L).toDF("doc_id")

  test("mp4 round-trip: brand, timescale, duration, track split, sizes") {
    val got = Mp4Ops.parseMp4Boxes(Mp4Ops.encodeMp4(corpus))
      .collect().map(r => r.getLong(0) -> r).toMap
    Seq(0L, 1L, 2L, 3L, 5L, 10L).foreach { id =>
      val r = got(id)
      val ts = 600 * (1 + (id % 4).toInt)
      val dur = (3 + id % 10) * ts + (id % 7) * 30
      val n = (1 + id % 3).toInt
      val nv = (0 until n).count(j => (id + j) % 2 == 0)
      assert(r.getString(1) === "isom")
      assert(r.getInt(2) === ts, s"doc $id timescale")
      assert(r.getLong(3) === dur, s"doc $id duration")
      assert(r.getDouble(4) === dur * 1000.0 / ts, s"doc $id ms")
      assert(r.getInt(5) === n && r.getInt(6) === nv &&
        r.getInt(7) === n - nv, s"doc $id tracks")
      assert(r.getInt(8) === (16 + id % 100).toInt, s"doc $id mdat")
      assert(r.getLong(9) === 160L + 141 * n + id % 100, s"doc $id total")
    }
  }

  test("64-bit extended size and size-to-EOF boxes parse") {
    val p = Mp4Ops.encodeMp4(corpus.filter($"doc_id" === 1L))
      .collect()(0).getAs[Array[Byte]](1)
    // rewrite the trailing mdat as size-0 (extends to EOF): same fields
    val mdatAt = p.length - (8 + 16 + 1 % 100)
    val eof = p.clone()
    eof(mdatAt) = 0; eof(mdatAt + 1) = 0; eof(mdatAt + 2) = 0
    eof(mdatAt + 3) = 0
    val viaEof = Mp4Ops.parseMp4Boxes(Seq((1L, eof)).toDF("doc_id", "payload"))
      .collect()(0)
    assert(viaEof.getInt(8) === 17 && viaEof.getInt(5) === 2)
    // rewrite ftyp with a 64-bit extended size (size=1 + 8-byte size)
    val ftypLen = 20
    val ext = new java.io.ByteArrayOutputStream()
    ext.write(Array[Byte](0, 0, 0, 1))
    ext.write("ftyp".getBytes("US-ASCII"))
    ext.write(Array[Byte](0, 0, 0, 0, 0, 0, 0, (ftypLen + 8).toByte))
    ext.write(p, 8, p.length - 8)
    val viaExt = Mp4Ops.parseMp4Boxes(
      Seq((1L, ext.toByteArray)).toDF("doc_id", "payload")).collect()(0)
    assert(viaExt.getString(1) === "isom" && viaExt.getInt(5) === 2)
  }

  test("overrunning box, missing moov and alien handler fail by doc id") {
    val p = Mp4Ops.encodeMp4(corpus.filter($"doc_id" === 2L))
      .collect()(0).getAs[Array[Byte]](1)
    // inflate the moov size past EOF
    val bad = p.clone(); bad(20) = 0x7f
    val e1 = intercept[org.apache.spark.SparkException] {
      Mp4Ops.parseMp4Boxes(Seq((2L, bad)).toDF("doc_id", "payload")).collect()
    }
    assert(e1.getCause.getMessage.contains("doc 2"))
    // truncate inside the moov payload
    val cut = p.take(60)
    val e2 = intercept[org.apache.spark.SparkException] {
      Mp4Ops.parseMp4Boxes(Seq((2L, cut)).toDF("doc_id", "payload")).collect()
    }
    assert(e2.getCause.getMessage.contains("doc 2"))
    // corrupt a handler type
    val s = new String(p, "ISO-8859-1")
    val hAt = s.indexOf("hdlr") + 4 + 8
    val alien = p.clone()
    "text".getBytes("US-ASCII").zipWithIndex.foreach { case (c, i) =>
      alien(hAt + i) = c }
    val e3 = intercept[org.apache.spark.SparkException] {
      Mp4Ops.parseMp4Boxes(Seq((2L, alien)).toDF("doc_id", "payload"))
        .collect()
    }
    assert(e3.getCause.getMessage.contains("unknown handler"))
  }

  test("box size above Int.MaxValue fails by doc id, not AIOOBE (ADVICE r10)") {
    val p = Mp4Ops.encodeMp4(corpus.filter($"doc_id" === 2L))
      .collect()(0).getAs[Array[Byte]](1)
    // 32-bit size with the 2^31 bit set: the old sz.toInt narrowing made
    // end negative, end <= to passed, and the walk indexed at a negative
    // offset (ArrayIndexOutOfBoundsException) instead of failing loudly
    val bad32 = p.clone(); bad32(20) = 0x80.toByte
    val e1 = intercept[org.apache.spark.SparkException] {
      Mp4Ops.parseMp4Boxes(Seq((2L, bad32)).toDF("doc_id", "payload"))
        .collect()
    }
    assert(e1.getCause.isInstanceOf[IllegalArgumentException] &&
      e1.getCause.getMessage.contains("doc 2"), s"got: ${e1.getCause}")
    // 64-bit extended size above Int.MaxValue: same contract
    val ext = new java.io.ByteArrayOutputStream()
    ext.write(Array[Byte](0, 0, 0, 1))
    ext.write("ftyp".getBytes("US-ASCII"))
    ext.write(Array[Byte](0, 0, 0, 1, 0, 0, 0, 0)) // 2^32
    ext.write(p, 8, p.length - 8)
    val e2 = intercept[org.apache.spark.SparkException] {
      Mp4Ops.parseMp4Boxes(Seq((2L, ext.toByteArray)).toDF("doc_id", "payload"))
        .collect()
    }
    assert(e2.getCause.isInstanceOf[IllegalArgumentException] &&
      e2.getCause.getMessage.contains("doc 2"), s"got: ${e2.getCause}")
  }

  test("parses the fixture corpus end to end, one row per doc") {
    val docs = Tables.documents(spark, sf)
    val out = Mp4Ops.parseMp4Boxes(Mp4Ops.encodeMp4(docs))
    assert(out.count() === docs.count())
    assert(out.filter(col("n_tracks") =!= col("n_video") + col("n_audio"))
      .count() === 0)
  }
}
