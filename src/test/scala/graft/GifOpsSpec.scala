package graft

import graft.operators.GifOps
import org.apache.spark.sql.functions._

class GifOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus = Seq(0L, 1L, 2L, 3L, 7L, 14L).toDF("doc_id")

  test("gif round-trip: dims, palette, top-left pixel, channel means") {
    val got = GifOps.decodeGif(GifOps.encodeGif(corpus))
      .collect().map(r => r.getLong(0) -> r).toMap
    Seq(0L, 1L, 2L, 3L, 7L, 14L).foreach { id =>
      val r = got(id)
      val w = 4 + (id % 5).toInt; val h = 4 + (id % 3).toInt
      assert(r.getInt(1) === w && r.getInt(2) === h, s"doc $id dims")
      assert(r.getInt(3) === 16)
      val c0 = (id % 16).toInt
      assert(r.getInt(4) === 16 * c0 && r.getInt(5) === 255 - 16 * c0 &&
        r.getInt(6) === (37 * c0) % 256, s"doc $id top-left")
      val idx = (0 until w * h).map(k => ((id + 7L * k) % 16).toInt)
      def mean(f: Int => Int) =
        graft.functions.GraftFunctions.round6(
          idx.map(f).map(_.toLong).sum.toDouble / (w * h))
      assert(r.getDouble(7) === mean(16 * _), s"doc $id mean_r")
      assert(r.getDouble(8) === mean(255 - 16 * _), s"doc $id mean_g")
      assert(r.getDouble(9) === mean(c => (37 * c) % 256), s"doc $id mean_b")
    }
  }

  test("the LZW code width actually grows on larger images") {
    // 8×6 = 48 pixels: dict grows from 18 to 65 entries, crossing the
    // 32-entry (codeSize 5→6) and 64-entry (6→7) thresholds — decode
    // correctness of the round-trip proves encoder and decoder agree on
    // every width change; an off-by-one desyncs the stream and fails
    val big = Seq(14L).toDF("doc_id") // w=8, h=6
    val r = GifOps.decodeGif(GifOps.encodeGif(big)).collect()(0)
    assert(r.getInt(1) * r.getInt(2) === 48)
  }

  test("bad magic, truncation and out-of-range codes fail by doc id") {
    val p = GifOps.encodeGif(corpus.filter($"doc_id" === 1L))
      .collect()(0).getAs[Array[Byte]](1)
    val bad = p.clone(); bad(0) = 'X'
    val e1 = intercept[org.apache.spark.SparkException] {
      GifOps.decodeGif(Seq((1L, bad)).toDF("doc_id", "payload")).collect()
    }
    assert(e1.getCause.getMessage.contains("doc 1"))
    val cut = p.take(p.length - 6)
    val e2 = intercept[org.apache.spark.SparkException] {
      GifOps.decodeGif(Seq((1L, cut)).toDF("doc_id", "payload")).collect()
    }
    assert(e2.getCause.getMessage.contains("doc 1"))
    // corrupt a byte inside the LZW stream: the decode must fail loudly
    // (out-of-range code / pixel overrun / count mismatch), never emit
    // silently wrong pixels as stats
    val palEnd = 13 + 48 // header+lsd(13) + 16*3 palette
    val lzwAt = palEnd + 10 + 2 // image descriptor + min code + sub-len
    val corrupt = p.clone()
    corrupt(lzwAt + 3) = (corrupt(lzwAt + 3) ^ 0x55).toByte
    val e3 = intercept[org.apache.spark.SparkException] {
      GifOps.decodeGif(Seq((1L, corrupt)).toDF("doc_id", "payload"))
        .collect()
    }
    assert(e3.getCause.getMessage.contains("doc 1"))
  }

  test("aHashGif matches an in-test replica of the luma bit math") {
    val got = GifOps.aHashGif(GifOps.encodeGif(corpus))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    Seq(0L, 1L, 2L, 3L, 7L, 14L).foreach { id =>
      val w = 4 + (id % 5).toInt; val h = 4 + (id % 3).toInt
      val luma = (0 until w * h)
        .map(k => 255L + (37 * ((id + 7L * k) % 16)) % 256)
      val total = luma.sum
      val expect = luma.zipWithIndex.collect {
        case (l, k) if l * w * h > total => 1L << k
      }.sum
      assert(got(id) === expect, s"doc $id")
    }
  }

  test("decodes the fixture corpus end to end, one row per doc") {
    val docs = Tables.documents(spark, sf)
    val out = GifOps.decodeGif(GifOps.encodeGif(docs))
    assert(out.count() === docs.count())
    assert(out.filter(col("palette_size") =!= 16).count() === 0)
  }
}
