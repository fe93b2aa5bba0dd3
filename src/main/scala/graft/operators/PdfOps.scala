package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PDF text extraction — the highest-frequency real ingest format a crawl
  * corpus carries after HTML (reference's curation scope: tickerlake has
  * no multimodal tier; this extends the training-data pipeline the way
  * [[WarcOps]] does for web containers).
  *
  * [[encodePdf]] writes REAL single-file PDFs around the fixture corpus:
  * a catalog → pages → page → content-stream object graph, byte-exact
  * xref table + trailer + startxref, content streams holding the doc's
  * text as `Tj`/`TJ` text-showing operators (alternated per page so both
  * parse paths run), FlateDecode-compressed on even doc_ids (raw
  * otherwise); every third page carries its content as a TWO-stream
  * `/Contents` array — the appended-content layout real generators emit.
  * [[extractPdfText]] is a REAL extractor: it finds
  * `startxref`, walks the xref table, resolves the catalog's /Pages tree
  * and each page's /Contents stream via the xref offsets (validating
  * each offset actually lands on the referenced object — a corrupt xref
  * fails loudly by doc id), inflates /FlateDecode streams through
  * java.util.zip, scans BT/ET text blocks, and concatenates the string
  * literals of `Tj`/`'`/`"` and `TJ` arrays with full escape handling
  * (\\n \\r \\t \\b \\f \\( \\) \\\\, octal \\ddd, line continuation).
  *
  * Contract (what the oracle replays): pages carry consecutive 256-BYTE
  * slices of the doc's UTF-8 text (so n_pages = max(1,
  * ceil(bytes/256))), literals carry the slice bytes verbatim, and the
  * extractor re-decodes the concatenation — extraction is byte-exact for
  * ANY input text, with no whitespace heuristics.
  *
  * Scale shape: both directions are partition-at-a-time projections over
  * a binary column (the object-store batch shape of [[MultimodalOps]]);
  * no shuffle, no driver round-trip, linear in corpus bytes.
  */
object PdfOps {

  private val pdfInSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType)))

  val pdfTextSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_pages", IntegerType),
    StructField("flate", BooleanType),
    StructField("pdf_text", StringType)))

  private val pageBytes = 256

  private def escapeLiteral(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length + 8)
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xff
      if (c == '(' || c == ')' || c == '\\') out.write('\\')
      out.write(c)
      i += 1
    }
    out.toByteArray
  }

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream(b.length / 2 + 32)
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(b: Array[Byte], id: Long): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(b)
    val out = new java.io.ByteArrayOutputStream(b.length * 3 + 32)
    val buf = new Array[Byte](4096)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        require(n > 0 || inf.finished(),
          s"truncated FlateDecode stream: doc $id")
        out.write(buf, 0, n)
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(
          s"corrupt FlateDecode stream: doc $id", e)
    } finally inf.end()
    out.toByteArray
  }

  /** One page's content stream: `BT /F1 12 Tf 72 720 Td <text ops> ET`.
    * Even page ordinals show the slice as one `(…) Tj`; odd ordinals
    * split it into a two-segment `[(…) -600 (…)] TJ` with a kern number
    * between — both operators and the kern-skip path get exercised by
    * every multi-page doc. */
  private def contentStream(slice: Array[Byte], pageIdx: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(slice.length + 64)
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    w("BT /F1 12 Tf 72 720 Td ")
    if (pageIdx % 2 == 0) {
      out.write('('); out.write(escapeLiteral(slice)); w(") Tj")
    } else {
      val cut = slice.length / 2
      w("[(")
      out.write(escapeLiteral(slice.take(cut)))
      w(") -600 (")
      out.write(escapeLiteral(slice.drop(cut)))
      w(")] TJ")
    }
    w(" ET")
    out.toByteArray
  }

  /** Per-doc PDF payload (see object scaladoc for the layout contract). */
  def encodePdf(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val enc = RowEncoder.encoderFor(pdfInSchema)
    docs.select(col(idCol).cast("long"), col(textCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val text = if (r.isNullAt(1)) "" else r.getString(1)
          val tb = text.getBytes("UTF-8")
          val nPages = math.max(1, (tb.length + pageBytes - 1) / pageBytes)
          val slices = (0 until nPages).map(i =>
            tb.slice(i * pageBytes, math.min((i + 1) * pageBytes, tb.length)))
          val useFlate = id % 2 == 0
          // objects: 1 catalog, 2 pages, then (page, content) per page
          val objs = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
          def ascii(s: String) = s.getBytes("US-ASCII")
          // page object numbers: pages consume 2 objects (page + stream),
          // or 3 when the page carries a two-stream /Contents array
          val pageNums = new Array[Int](nPages)
          var nextObj = 3
          for (i <- 0 until nPages) {
            pageNums(i) = nextObj
            nextObj += (if (i % 3 == 2) 3 else 2)
          }
          val kids = pageNums.map(n => s"$n 0 R").mkString(" ")
          objs += ascii("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
          objs += ascii(s"2 0 obj\n<< /Type /Pages /Kids [$kids] " +
            s"/Count $nPages >>\nendobj\n")
          def streamObj(num: Int, raw: Array[Byte]): Array[Byte] = {
            val body = if (useFlate) deflate(raw) else raw
            val filt = if (useFlate) " /Filter /FlateDecode" else ""
            val head = ascii(
              s"$num 0 obj\n<< /Length ${body.length}$filt >>\nstream\n")
            val bo = new java.io.ByteArrayOutputStream(
              head.length + body.length + 24)
            bo.write(head); bo.write(body)
            bo.write(ascii("\nendstream\nendobj\n"))
            bo.toByteArray
          }
          slices.zipWithIndex.foreach { case (slice, i) =>
            val pageNum = objs.length + 1
            if (i % 3 == 2) {
              // every third page splits its content across TWO stream
              // objects referenced by a /Contents ARRAY — the layout real
              // generators emit when they append content; extraction must
              // concatenate streams in array order
              val cut = slice.length / 2
              objs += ascii(s"$pageNum 0 obj\n<< /Type /Page " +
                s"/Parent 2 0 R /Contents [${pageNum + 1} 0 R " +
                s"${pageNum + 2} 0 R] >>\nendobj\n")
              objs += streamObj(pageNum + 1, contentStream(slice.take(cut), i))
              objs += streamObj(pageNum + 2, contentStream(slice.drop(cut), i))
            } else {
              objs += ascii(s"$pageNum 0 obj\n<< /Type /Page " +
                s"/Parent 2 0 R /Contents ${pageNum + 1} 0 R >>\nendobj\n")
              objs += streamObj(pageNum + 1, contentStream(slice, i))
            }
          }
          val out = new java.io.ByteArrayOutputStream()
          out.write(ascii("%PDF-1.4\n"))
          val offsets = new Array[Int](objs.length)
          objs.zipWithIndex.foreach { case (o, i) =>
            offsets(i) = out.size(); out.write(o)
          }
          val xrefPos = out.size()
          out.write(ascii(s"xref\n0 ${objs.length + 1}\n"))
          out.write(ascii("0000000000 65535 f \n"))
          offsets.foreach(off =>
            out.write(ascii(f"$off%010d 00000 n \n")))
          out.write(ascii(s"trailer\n<< /Size ${objs.length + 1} " +
            s"/Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n"))
          Row(id, out.toByteArray)
        }
      }(enc)
  }

  // ---- the extractor ------------------------------------------------

  /** Minimal object model: we resolve only what the page tree needs —
    * a name-keyed map of values that are either Long (int), String
    * (name), (Long, "R") refs, or arrays of refs. */
  private def parseDict(s: String, id: Long): Map[String, String] = {
    // values captured as raw substrings up to the next key or dict end;
    // the PDFs we must read (ours + simple third-party layouts) keep page
    // machinery un-nested, so a flat scan is faithful here and anything
    // unresolvable fails loudly downstream by doc id
    val body = {
      val a = s.indexOf("<<"); val b = s.lastIndexOf(">>")
      require(a >= 0 && b > a, s"malformed dictionary: doc $id")
      s.substring(a + 2, b)
    }
    val keyRe = "/([A-Za-z0-9]+)".r
    val hits = keyRe.findAllMatchIn(body).toArray
    hits.indices.flatMap { i =>
      val k = hits(i).group(1)
      val vStart = hits(i).end
      val vEnd = if (i + 1 < hits.length) hits(i + 1).start else body.length
      val v = body.substring(vStart, vEnd).trim
      // a name value (e.g. /Filter /FlateDecode) captures as an empty
      // span followed by the next "key" — re-join that case
      if (v.isEmpty && i + 1 < hits.length)
        Some(k -> ("/" + hits(i + 1).group(1)))
      else Some(k -> v)
    }.toMap
  }

  private def refNum(v: String, what: String, id: Long): Int = {
    val m = "^(\\d+)\\s+\\d+\\s+R".r.findFirstMatchIn(v)
    require(m.isDefined, s"expected indirect ref for $what, got '$v': doc $id")
    m.get.group(1).toInt
  }

  /** Extract every text-showing operator's literal bytes from one
    * decoded content stream, in order. Handles (…) literals with the
    * full escape set, skips kern numbers inside TJ arrays, and accepts
    * Tj, ', " and TJ. */
  private[graft] def textFromContent(c: Array[Byte], id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(c.length)
    var i = 0
    while (i < c.length) {
      if (c(i) == '(') {
        i += 1
        var depth = 1
        while (i < c.length && depth > 0) {
          val b = c(i) & 0xff
          if (b == '\\') {
            require(i + 1 < c.length, s"dangling escape in literal: doc $id")
            val e = c(i + 1) & 0xff
            e match {
              case 'n' => out.write('\n'); i += 2
              case 'r' => out.write('\r'); i += 2
              case 't' => out.write('\t'); i += 2
              case 'b' => out.write('\b'); i += 2
              case 'f' => out.write('\f'); i += 2
              case '(' | ')' | '\\' => out.write(e); i += 2
              case '\n' => i += 2 // line continuation: both bytes vanish
              case '\r' =>
                i += 2; if (i < c.length && c(i) == '\n') i += 1
              case d if d >= '0' && d <= '7' =>
                var v = 0; var n = 0; i += 1
                while (n < 3 && i < c.length &&
                    c(i) >= '0' && c(i) <= '7') {
                  v = v * 8 + (c(i) - '0'); i += 1; n += 1
                }
                out.write(v & 0xff)
              case other =>
                // per spec: unknown escape ⇒ the backslash is dropped
                out.write(other); i += 2
            }
          } else if (b == '(') { depth += 1; out.write(b); i += 1 }
          else if (b == ')') {
            depth -= 1; if (depth > 0) out.write(b); i += 1
          } else { out.write(b); i += 1 }
        }
        require(depth == 0, s"unterminated string literal: doc $id")
      } else i += 1
    }
    out.toByteArray
  }

  /** REAL PDF text extraction (see object scaladoc). One row per doc:
    * (doc_id, n_pages, flate, pdf_text). */
  def extractPdfText(payloads: DataFrame, idCol: String = "doc_id",
                     payloadCol: String = "payload"): DataFrame = {
    val enc = RowEncoder.encoderFor(pdfTextSchema)
    payloads.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (nPages, flate, text) = extractOne(bytes, id)
          Row(id, nPages, flate, text)
        }
      }(enc)
  }

  private def asciiAt(b: Array[Byte], from: Int, len: Int): String =
    new String(b, from, math.max(0, math.min(len, b.length - from)),
      "ISO-8859-1")

  private[graft] def extractOne(bytes: Array[Byte],
                                id: Long): (Int, Boolean, String) = {
    val all = new String(bytes, "ISO-8859-1") // byte-transparent view
    require(all.startsWith("%PDF-"), s"missing %PDF header: doc $id")
    // startxref: last occurrence near EOF
    val sx = all.lastIndexOf("startxref")
    require(sx >= 0, s"missing startxref: doc $id")
    val xrefPos = "\\d+".r
      .findFirstIn(all.substring(sx + "startxref".length))
      .map(_.toLong)
      .getOrElse(throw new IllegalArgumentException(
        s"unreadable startxref offset: doc $id"))
    require(xrefPos >= 0 && xrefPos < bytes.length &&
      asciiAt(bytes, xrefPos.toInt, 4) == "xref",
      s"startxref does not land on an xref table: doc $id")
    // xref subsection: "start count" then count 20-byte entries
    var p = xrefPos.toInt + 4
    while (p < bytes.length && (bytes(p) == '\n' || bytes(p) == '\r')) p += 1
    val sub = "^(\\d+)\\s+(\\d+)".r.findFirstMatchIn(asciiAt(bytes, p, 32))
      .getOrElse(throw new IllegalArgumentException(
        s"malformed xref subsection header: doc $id"))
    val first = sub.group(1).toInt
    val count = sub.group(2).toInt
    p += sub.group(0).length
    while (p < bytes.length && (bytes(p) == '\n' || bytes(p) == '\r')) p += 1
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    for (i <- 0 until count) {
      val e = asciiAt(bytes, p + 20 * i, 20)
      require(e.length >= 18, s"truncated xref entry ${first + i}: doc $id")
      if (e.charAt(17) == 'n')
        offsets(first + i) = e.substring(0, 10).toInt
    }
    val trailerAt = all.indexOf("trailer", p + 20 * count)
    require(trailerAt >= 0, s"missing trailer: doc $id")
    val trailer = parseDict(
      all.substring(trailerAt, all.indexOf(">>", trailerAt) + 2), id)
    val rootNum = refNum(trailer.getOrElse("Root",
      throw new IllegalArgumentException(s"trailer has no /Root: doc $id")),
      "/Root", id)

    // resolve one object's full text "k 0 obj … endobj" via the xref,
    // VALIDATING the offset lands on the numbered object it claims
    def objText(num: Int): String = {
      val off = offsets.getOrElse(num,
        throw new IllegalArgumentException(
          s"xref has no in-use entry for object $num: doc $id"))
      require(off >= 0 && off < bytes.length &&
        asciiAt(bytes, off, 24).matches(s"(?s)^$num\\s+\\d+\\s+obj.*"),
        s"corrupt xref: offset $off does not hold object $num: doc $id")
      val end = all.indexOf("endobj", off)
      require(end >= 0, s"object $num has no endobj: doc $id")
      all.substring(off, end)
    }

    val catalog = parseDict(objText(rootNum), id)
    val pagesNum = refNum(catalog.getOrElse("Pages",
      throw new IllegalArgumentException(s"catalog has no /Pages: doc $id")),
      "/Pages", id)
    val pagesDict = parseDict(objText(pagesNum), id)
    val kidsRaw = pagesDict.getOrElse("Kids",
      throw new IllegalArgumentException(s"pages has no /Kids: doc $id"))
    val kids = "(\\d+)\\s+\\d+\\s+R".r.findAllMatchIn(kidsRaw)
      .map(_.group(1).toInt).toArray
    require(kids.nonEmpty, s"empty /Kids: doc $id")
    var sawFlate = false
    val textBytes = new java.io.ByteArrayOutputStream()
    kids.foreach { pageNum =>
      val page = parseDict(objText(pageNum), id)
      // /Contents is a single ref OR an array of refs (content appended
      // by a second writer) — streams concatenate in array order
      val contentsRaw = page.getOrElse("Contents",
        throw new IllegalArgumentException(
          s"page $pageNum has no /Contents: doc $id"))
      val contNums = "(\\d+)\\s+\\d+\\s+R".r.findAllMatchIn(contentsRaw)
        .map(_.group(1).toInt).toArray
      require(contNums.nonEmpty,
        s"page $pageNum has an unresolvable /Contents '$contentsRaw': doc $id")
      contNums.foreach { contNum =>
        // the content object: dict + stream body of exactly /Length bytes
        val off = offsets.getOrElse(contNum,
          throw new IllegalArgumentException(
            s"xref has no in-use entry for object $contNum: doc $id"))
        require(
          asciiAt(bytes, off, 24).matches(s"(?s)^$contNum\\s+\\d+\\s+obj.*"),
          s"corrupt xref: offset $off does not hold object $contNum: doc $id")
        val dictEnd = all.indexOf(">>", off)
        require(dictEnd >= 0, s"content object $contNum has no dict: doc $id")
        val dict = parseDict(all.substring(off, dictEnd + 2), id)
        val len = dict.getOrElse("Length",
          throw new IllegalArgumentException(
            s"content stream has no /Length: doc $id")).trim.toInt
        val isFlate = dict.get("Filter").exists(_.contains("FlateDecode"))
        sawFlate ||= isFlate
        val sAt = all.indexOf("stream", dictEnd)
        require(sAt >= 0, s"content object $contNum has no stream: doc $id")
        var body = sAt + "stream".length
        if (body < bytes.length && bytes(body) == '\r') body += 1
        if (body < bytes.length && bytes(body) == '\n') body += 1
        require(body + len <= bytes.length,
          s"stream body overruns payload (len $len): doc $id")
        val raw = java.util.Arrays.copyOfRange(bytes, body, body + len)
        val content = if (isFlate) inflate(raw, id) else raw
        textBytes.write(textFromContent(content, id))
      }
    }
    (kids.length, sawFlate, new String(textBytes.toByteArray, "UTF-8"))
  }
}
