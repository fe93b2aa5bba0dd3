package graft

import graft.operators.Mp3Ops
import org.apache.spark.sql.functions._

class Mp3OpsSpec extends SparkSpecBase {
  import spark.implicits._

  // ids chosen to cover: ID3 present (0, 3), every samplerate (0,1,2),
  // odd/even padding phase, high bitrate index (13 → 256)
  private def corpus = Seq(0L, 1L, 2L, 3L, 13L, 27L).toDF("doc_id")

  test("mp3 round-trip: frame count, tables, padding, bytes, duration") {
    val got = Mp3Ops.parseMp3Frames(Mp3Ops.encodeMp3(corpus))
      .collect().map(r => r.getLong(0) -> r).toMap
    val brs = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
      224, 256, 320)
    val srs = Array(44100, 48000, 32000)
    Seq(0L, 1L, 2L, 3L, 13L, 27L).foreach { id =>
      val r = got(id)
      val n = (2 + id % 7).toInt
      val kbps = brs(1 + (id % 14).toInt)
      val sr = srs((id % 3).toInt)
      val pad = (0 until n).count(j => (id + j) % 2 == 1)
      val id3 = if (id % 3 == 0) (30 + id % 30).toInt else 0
      assert(r.getInt(1) === n, s"doc $id n_frames")
      assert(r.getInt(2) === kbps, s"doc $id bitrate")
      assert(r.getInt(3) === sr, s"doc $id samplerate")
      assert(r.getInt(4) === pad, s"doc $id padded")
      assert(r.getInt(5) === id3, s"doc $id id3 bytes")
      assert(r.getLong(6) ===
        id3 + n.toLong * (144000 * kbps / sr) + pad, s"doc $id bytes")
      assert(r.getDouble(7) === n * 1152 * 1000.0 / sr, s"doc $id duration")
    }
  }

  test("desync, truncation and VBR fail loudly by doc id") {
    val p = Mp3Ops.encodeMp3(corpus.filter($"doc_id" === 1L))
      .collect()(0).getAs[Array[Byte]](1)
    // flip the first sync byte
    val desync = p.clone(); desync(0) = 0x00
    val e1 = intercept[org.apache.spark.SparkException] {
      Mp3Ops.parseMp3Frames(Seq((1L, desync)).toDF("doc_id", "payload"))
        .collect()
    }
    assert(e1.getMessage.contains("doc 1") ||
      e1.getCause.getMessage.contains("doc 1"))
    // cut the last frame short
    val cut = p.take(p.length - 3)
    val e2 = intercept[org.apache.spark.SparkException] {
      Mp3Ops.parseMp3Frames(Seq((1L, cut)).toDF("doc_id", "payload"))
        .collect()
    }
    assert(e2.getCause.getMessage.contains("doc 1"))
    // change the second frame's bitrate index → VBR rejection
    // doc 1: bitrate idx 2 = 40 kbps, sr 48000, frame 0 padded →
    // first frame is 144000·40/48000 + 1 = 121 bytes; header byte 2 of
    // the SECOND frame sits at 121 + 2
    val vbr = p.clone(); vbr(121 + 2) = 0x94.toByte // idx 9, same sr/pad
    val e3 = intercept[org.apache.spark.SparkException] {
      Mp3Ops.parseMp3Frames(Seq((1L, vbr)).toDF("doc_id", "payload"))
        .collect()
    }
    assert(e3.getCause.getMessage.contains("VBR"))
  }

  test("parses the fixture corpus end to end, one row per doc") {
    val docs = Tables.documents(spark, sf)
    val out = Mp3Ops.parseMp3Frames(Mp3Ops.encodeMp3(docs))
    assert(out.count() === docs.count())
    assert(out.filter(col("n_frames") < 2 || col("n_frames") > 8).count() === 0)
  }
}
