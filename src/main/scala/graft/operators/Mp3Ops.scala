package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MP3 frame-HEADER parsing — metadata-level (sync scan, version/layer
  * bits, bitrate/samplerate tables, frame-length arithmetic, frame count
  * and duration), NO entropy decode: what a crawl-ingest pipeline needs
  * to deterministically fingerprint-or-skip the dominant crawled-audio
  * format (the [[MultimodalOps.decodeWav]] twin for lossy audio; full
  * MDCT/Huffman synthesis is out of scope and documented so in README).
  *
  * [[encodeMp3]] writes structurally real CBR MPEG-1 Layer III streams
  * around the fixture corpus: 4-byte headers with correct sync/version/
  * layer/bitrate-index/samplerate-index/padding bits, frame bodies of
  * exactly `144·bitrate/samplerate + padding` total bytes (the Layer III
  * frame-length law, header included), an ID3v2 tag with a syncsafe size
  * on every third doc. [[parseMp3Frames]] is a REAL header walk: skip
  * ID3v2 via its syncsafe length, then hop frame to frame by computed
  * length, validating sync and the reserved bitrate/samplerate codes,
  * requiring CBR consistency — truncated or desynced streams fail
  * loudly by doc id.
  *
  * All emitted fields are closed-form in doc_id, so the DuckDB oracle
  * replays frame counts, table lookups, padding tallies, byte totals and
  * duration from the `documents` table alone.
  *
  * Scale shape: partition-at-a-time projection over a binary column —
  * no shuffle, linear in corpus bytes, same batch shape as every
  * [[MultimodalOps]] codec.
  */
object Mp3Ops {

  // MPEG-1 Layer III tables (ISO/IEC 11172-3): bitrate index 1..14, sr
  // index 0..2 (3 is reserved)
  private val bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val samplerates = Array(44100, 48000, 32000)
  private val samplesPerFrame = 1152

  private val mp3InSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType)))

  val mp3FramesSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_frames", IntegerType),
    StructField("bitrate_kbps", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("padded_frames", IntegerType),
    StructField("id3_bytes", IntegerType),
    StructField("total_bytes", LongType),
    StructField("duration_ms", DoubleType)))

  private def frameLen(kbps: Int, sr: Int, pad: Int): Int =
    144000 * kbps / sr + pad

  /** Per-doc CBR stream: n_frames = 2 + id%7, bitrate index 1 + id%14,
    * samplerate index id%3, frame j padded iff (id+j) odd, ID3v2 tag of
    * 10 + (20 + id%30) bytes on id%3 == 0. Frame bodies after the 4-byte
    * header are a deterministic byte ramp (never 0xFF, so no false
    * sync). */
  def encodeMp3(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val enc = RowEncoder.encoderFor(mp3InSchema)
    docs.select(col(idCol).cast("long"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val nFrames = (2 + id % 7).toInt
          val kbps = bitrates(1 + (id % 14).toInt)
          val sr = samplerates((id % 3).toInt)
          val out = new java.io.ByteArrayOutputStream()
          if (id % 3 == 0) {
            val body = (20 + id % 30).toInt
            out.write("ID3".getBytes("US-ASCII"))
            out.write(4); out.write(0) // version 2.4.0
            out.write(0) // flags
            // syncsafe 28-bit size of the tag BODY (header's 10 excluded)
            out.write((body >> 21) & 0x7f); out.write((body >> 14) & 0x7f)
            out.write((body >> 7) & 0x7f); out.write(body & 0x7f)
            (0 until body).foreach(i => out.write((id + i).toInt & 0x7e))
          }
          (0 until nFrames).foreach { j =>
            val pad = ((id + j) % 2).toInt
            val len = frameLen(kbps, sr, pad)
            // header: FF FB = sync + MPEG1 + Layer III + no CRC;
            // byte 2 = bitrate idx | sr idx | padding; byte 3 = zeros
            out.write(0xff); out.write(0xfb)
            out.write(((1 + (id % 14).toInt) << 4) |
              ((id % 3).toInt << 2) | (pad << 1))
            out.write(0x00)
            (4 until len).foreach(i => out.write((id + j + i).toInt & 0x7f))
          }
          Row(id, out.toByteArray)
        }
      }(enc)
  }

  /** REAL frame-header walk (see object scaladoc). One row per doc. */
  def parseMp3Frames(payloads: DataFrame, idCol: String = "doc_id",
                     payloadCol: String = "payload"): DataFrame = {
    val enc = RowEncoder.encoderFor(mp3FramesSchema)
    payloads.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          var pos = 0
          var id3 = 0
          if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
            val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
              ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
            id3 = 10 + size
            require(id3 <= b.length, s"ID3v2 size overruns payload: doc $id")
            pos = id3
          }
          var nFrames = 0
          var padded = 0
          var kbps = -1
          var sr = -1
          while (pos < b.length) {
            require(pos + 4 <= b.length, s"truncated frame header: doc $id")
            val h0 = b(pos) & 0xff; val h1 = b(pos + 1) & 0xff
            val h2 = b(pos + 2) & 0xff
            require(h0 == 0xff && (h1 & 0xe0) == 0xe0,
              f"lost sync at byte $pos (0x$h0%02x 0x$h1%02x): doc $id")
            require((h1 & 0x18) == 0x18, s"not MPEG-1 at byte $pos: doc $id")
            require((h1 & 0x06) == 0x02, s"not Layer III at byte $pos: doc $id")
            val bIdx = (h2 >> 4) & 0x0f
            val sIdx = (h2 >> 2) & 0x03
            require(bIdx != 0 && bIdx != 15,
              s"free/reserved bitrate index at byte $pos: doc $id")
            require(sIdx != 3, s"reserved samplerate index: doc $id")
            val pad = (h2 >> 1) & 0x01
            val fk = bitrates(bIdx); val fs = samplerates(sIdx)
            if (nFrames == 0) { kbps = fk; sr = fs }
            else require(fk == kbps && fs == sr,
              s"VBR stream (frame $nFrames changes rate): doc $id")
            val len = frameLen(fk, fs, pad)
            require(pos + len <= b.length,
              s"frame $nFrames overruns payload: doc $id")
            nFrames += 1
            padded += pad
            pos += len
          }
          require(nFrames > 0, s"no MP3 frames: doc $id")
          val durMs = nFrames * samplesPerFrame * 1000.0 / sr
          Row(id, nFrames, kbps, sr, padded, id3, b.length.toLong, durMs)
        }
      }(enc)
  }
}
