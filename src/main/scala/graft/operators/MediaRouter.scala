package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The multimodal tier's front door: magic-byte format sniffing over an
  * opaque binary column, so a mixed crawled-media table can be routed to
  * the right decoder ([[MultimodalOps]] BMP/PNG/JPEG/WAV, [[GifOps]],
  * [[Mp3Ops]], [[Mp4Ops]], [[PdfOps]], [[WarcOps]]) or skipped — the
  * decision every ingest pipeline makes before it spends decode cycles.
  *
  * [[sniffFormat]] is a PURE codegen column expression (binary substring
  * compares — functions, not UDFs): zero shuffle, zero object
  * serialization, pushdown-friendly. [[encodeMixed]] builds the mixed
  * fixture by routing each doc through one of the nine real encoders by
  * doc_id mod 9, so `q_media_sniff`'s oracle is closed-form and the
  * sniffer is exercised against every container this repo can write.
  */
object MediaRouter {

  private def bytesLit(xs: Int*): Column = lit(xs.map(_.toByte).toArray)

  /** Magic-byte format id for a binary payload column. Order matters
    * only for robustness (the specific long magics run before the
    * 2-byte ones); every format this repo writes is disjoint at the
    * magic level. */
  def sniffFormat(payload: Column): Column =
    when(substring(payload, 1, 5) === lit("%PDF-".getBytes("US-ASCII")),
      "pdf")
      .when(substring(payload, 1, 4) === bytesLit(0x89, 'P', 'N', 'G'),
        "png")
      .when(substring(payload, 1, 3) === bytesLit(0xff, 0xd8, 0xff),
        "jpeg")
      .when(substring(payload, 1, 4) === lit("GIF8".getBytes("US-ASCII")),
        "gif")
      .when(substring(payload, 1, 4) === lit("RIFF".getBytes("US-ASCII")) &&
        substring(payload, 9, 4) === lit("WAVE".getBytes("US-ASCII")),
        "wav")
      .when(substring(payload, 5, 4) === lit("ftyp".getBytes("US-ASCII")),
        "mp4")
      .when(substring(payload, 1, 3) === lit("ID3".getBytes("US-ASCII")) ||
        substring(payload, 1, 2) === bytesLit(0xff, 0xfb),
        "mp3")
      .when(substring(payload, 1, 2) === lit("BM".getBytes("US-ASCII")),
        "bmp")
      .when(substring(payload, 1, 2) === bytesLit(0x1f, 0x8b),
        "warc_gz")
      .otherwise("unknown")

  /** The composed tier under ONE hash: sniff each payload, DISPATCH it
    * to its real parser, and normalize every format's primary integer
    * fact into one (doc_id, format, units) row — pixels for images,
    * samples for WAV, frames for MP3, duration units for MP4, pages for
    * PDF, records for WARC. A payload routed to the wrong parser throws
    * (each decoder validates its magic), and a mis-parsed one mismatches
    * `units`, so `q_media_route`'s oracle catches routing AND parsing
    * errors through the whole tier at once (the [[WebOps]]
    * `q_crawl_extract` doctrine, applied to media).
    *
    * Scale shape: nine disjoint per-partition parse branches behind one
    * codegen filter each, unioned — the only exchange is the WARC
    * branch's per-doc record count. */
  def routeUnits(payloads: DataFrame, idCol: String = "doc_id",
                 payloadCol: String = "payload"): DataFrame = {
    // every decoder emits a FIXED doc_id output column regardless of its
    // input id name, so a custom idCol used to fail at analysis time in
    // norm() (ADVICE r10): normalize the id/payload names ONCE up front
    // and use doc_id/payload consistently in every branch.
    val tagged = payloads.select(col(idCol).cast("long").as("doc_id"),
      col(payloadCol).as("payload"),
      sniffFormat(col(payloadCol)).as("format"))
    def sub(f: String): DataFrame =
      tagged.filter(col("format") === f).select(col("doc_id"), col("payload"))
    def norm(df: DataFrame, f: String, units: Column): DataFrame =
      df.select(col("doc_id"), lit(f).as("format"),
        units.cast("long").as("units"))
    norm(MultimodalOps.decodeBmp(sub("bmp")), "bmp",
        col("width") * col("height"))
      .unionByName(norm(MultimodalOps.decodePng(sub("png")), "png",
        col("width") * col("height")))
      .unionByName(norm(MultimodalOps.decodeJpeg(sub("jpeg")), "jpeg",
        col("width") * col("height")))
      .unionByName(norm(GifOps.decodeGif(sub("gif")), "gif",
        col("width") * col("height")))
      .unionByName(norm(MultimodalOps.decodeWav(sub("wav")), "wav",
        col("n_samples")))
      .unionByName(norm(Mp3Ops.parseMp3Frames(sub("mp3")), "mp3",
        col("n_frames")))
      .unionByName(norm(Mp4Ops.parseMp4Boxes(sub("mp4")), "mp4",
        col("duration_units")))
      .unionByName(norm(PdfOps.extractPdfText(sub("pdf")), "pdf",
        col("n_pages")))
      .unionByName(norm(
        WarcOps.decodeWarc(sub("warc_gz"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_records")),
        "warc_gz", col("n_records")))
      // no silent truncation: payloads no sniffer rule claims still get a
      // row (format 'unknown', units = byte length) — a crawl pipeline
      // must ACCOUNT for what it skips, not drop it on the floor
      .unionByName(norm(
        tagged.filter(col("format") === "unknown")
          .select(col("doc_id"), length(col("payload")).as("n_bytes")),
        "unknown", col("n_bytes")))
  }

  /** One payload per doc, format chosen by doc_id mod 9 — every real
    * encoder in the repo contributes, so the sniffer's answer has a
    * closed-form oracle. */
  def encodeMixed(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    def part(m: Int)(f: DataFrame => DataFrame): DataFrame =
      f(docs.filter(pmod(col(idCol), lit(9)) === m))
        .select(col(idCol).cast("long").as(idCol), col("payload"))
    part(0)(d => MultimodalOps.encodeBmp(d, idCol))
      .unionByName(part(1)(d => MultimodalOps.encodePng(d, idCol)))
      .unionByName(part(2)(d => MultimodalOps.encodeJpeg(d, idCol)))
      .unionByName(part(3)(d => GifOps.encodeGif(d, idCol)))
      .unionByName(part(4)(d => MultimodalOps.encodeWav(d, idCol)))
      .unionByName(part(5)(d => Mp3Ops.encodeMp3(d, idCol)))
      .unionByName(part(6)(d => Mp4Ops.encodeMp4(d, idCol)))
      .unionByName(part(7)(d => PdfOps.encodePdf(d, idCol)))
      .unionByName(part(8)(d => WarcOps.encodeWarc(d, idCol)))
  }
}
