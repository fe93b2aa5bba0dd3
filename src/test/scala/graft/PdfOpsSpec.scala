package graft

import graft.operators.PdfOps
import org.apache.spark.sql.functions._

class PdfOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus = Seq(
    // even id ⇒ FlateDecode; odd ⇒ raw streams
    (0L, "plain ascii text"),
    (1L, "parens (nested (deep)) and \\backslashes\\ and )stray( bits"),
    (2L, "newlines\nand\r\nreturns\tand tabs survive byte-exact"),
    (3L, ""),
    (4L, "unicode: čřž 汉字 emoji 😀 mixed in"),
    // > 256 bytes ⇒ multi-page, exercising both Tj (even page ordinals)
    // and TJ (odd): 60 words of ~8 chars ≈ 540 bytes ⇒ 3 pages
    (5L, (1 to 60).map(i => s"word$i-abc").mkString(" ")),
    // multi-byte chars straddling the 256-byte page cut: 200 × 'é'
    // (2 bytes each) splits a codepoint across pages — the extractor
    // must reassemble bytes across pages BEFORE decoding UTF-8
    (6L, "é" * 200))
    .toDF("doc_id", "text")

  test("pdf round-trip: byte-exact text, page count, filter flag") {
    val got = PdfOps.extractPdfText(PdfOps.encodePdf(corpus))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getBoolean(2), r.getString(3)))).toMap
    val texts = corpus.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, t) =>
      val bytes = t.getBytes("UTF-8").length
      val expPages = math.max(1, (bytes + 255) / 256)
      val (pages, flate, text) = got(id)
      assert(text === t, s"doc $id text mismatch")
      assert(pages === expPages, s"doc $id page count")
      assert(flate === (id % 2 == 0), s"doc $id filter flag")
    }
  }

  test("encoded payload is a structurally real PDF") {
    val p = PdfOps.encodePdf(corpus.filter($"doc_id" === 5L))
      .collect()(0).getAs[Array[Byte]](1)
    val s = new String(p, "ISO-8859-1")
    assert(s.startsWith("%PDF-1.4"))
    assert(s.contains("/Type /Catalog") && s.contains("/Type /Pages"))
    assert(s.contains("xref") && s.contains("startxref"))
    assert(s.endsWith("%%EOF\n"))
    // xref offsets are REAL: every in-use entry lands on its object
    val sx = s.lastIndexOf("startxref")
    val xrefPos = "\\d+".r.findFirstIn(s.substring(sx + 9)).get.toInt
    assert(s.substring(xrefPos).startsWith("xref"))
    // doc 5 (odd) must carry raw streams with visible TJ arrays AND Tj
    assert(s.contains(") Tj") && s.contains(")] TJ"))
    assert(!s.contains("FlateDecode"))
    // 3 pages ⇒ page index 2 carries the two-stream /Contents array form
    assert(s.contains("/Contents ["))
  }

  test("corrupt xref fails loudly by doc id") {
    val p = PdfOps.encodePdf(corpus.filter($"doc_id" === 1L))
      .collect()(0).getAs[Array[Byte]](1)
    // point startxref at a wrong (but in-range) offset
    val s = new String(p, "ISO-8859-1")
    val sx = s.lastIndexOf("startxref")
    val numAt = sx + "startxref\n".length
    val digits = s.substring(numAt).takeWhile(_.isDigit).length
    val broken = (s.substring(0, numAt) + "0" * digits +
      s.substring(numAt + digits)).getBytes("ISO-8859-1")
    val e1 = intercept[IllegalArgumentException] {
      PdfOps.extractOne(broken, 1L)
    }
    assert(e1.getMessage.contains("doc 1"), e1.getMessage)
    // corrupt one xref ENTRY (object offset) but keep the table valid
    val xrefPos = "\\d+".r.findFirstIn(s.substring(sx + 9)).get.toInt
    val entryAt = s.indexOf("\n", s.indexOf("\n", xrefPos) + 1) + 1 +
      20 // skip the free entry; first in-use entry
    val broken2 = (s.substring(0, entryAt) + "0000000001" +
      s.substring(entryAt + 10)).getBytes("ISO-8859-1")
    val e2 = intercept[IllegalArgumentException] {
      PdfOps.extractOne(broken2, 1L)
    }
    assert(e2.getMessage.contains("doc 1"), e2.getMessage)
  }

  test("truncated flate stream fails loudly by doc id") {
    val p = PdfOps.encodePdf(corpus.filter($"doc_id" === 0L))
      .collect()(0).getAs[Array[Byte]](1)
    val s = new String(p, "ISO-8859-1")
    // slice 4 bytes out of the middle of the deflate body, fix /Length
    val at = s.indexOf("stream\n") + "stream\n".length
    val lenAt = s.indexOf("/Length ") + "/Length ".length
    val lenStr = s.substring(lenAt).takeWhile(_.isDigit)
    val cut = (s.substring(0, lenAt) + (lenStr.toInt - 4) +
      s.substring(lenAt + lenStr.length, at + 8) +
      s.substring(at + 12)).getBytes("ISO-8859-1")
    val e = intercept[IllegalArgumentException] {
      PdfOps.extractOne(cut, 0L)
    }
    assert(e.getMessage.contains("doc 0"), e.getMessage)
  }

  test("extraction runs over the fixture corpus end to end") {
    val docs = Tables.documents(spark, sf)
    val out = PdfOps.extractPdfText(PdfOps.encodePdf(docs))
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
    assert(out.filter(col("pdf_text") =!= col("text")).count() === 0)
    assert(out.count() === docs.count())
  }
}
