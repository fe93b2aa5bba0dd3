package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MP4 / ISO-BMFF box parsing — the VIDEO leg of the multimodal
  * metadata triad ([[Mp3Ops]] = audio, [[PdfOps]] = documents):
  * container-level facts a crawl pipeline needs to route, budget, or
  * skip video payloads (brand, timescale, duration, track inventory)
  * WITHOUT a codec. Sample decode is out of scope (as README documents
  * for MP3 synthesis); the container walk is the real, load-bearing
  * part — it is what distinguishes video from opaque bytes at ingest.
  *
  * [[encodeMp4]] writes structurally real ISO base-media files: a
  * `ftyp` (major brand + compatible brand), a `moov` container holding
  * a SPEC-SHAPED 108-byte `mvhd` (version 0: timescale + duration at
  * their standard offsets, matrix/rate fields zeroed) and one full
  * `trak` per track (92-byte `tkhd`, `mdia` wrapping a `hdlr` whose
  * handler type alternates `vide`/`soun`), and an `mdat` with a
  * deterministic byte ramp. [[parseMp4Boxes]] is a REAL box walk:
  * big-endian length-prefixed boxes (64-bit extended sizes and
  * size-to-EOF accepted), container recursion for moov/trak/mdia,
  * `ftyp`-first validation, every box required to fit its parent —
  * truncated or overrunning boxes fail loudly by doc id.
  *
  * Every emitted field is closed-form in doc_id, so the DuckDB oracle
  * replays brand, timescale, duration (units and ms), the video/audio
  * track split, mdat payload bytes and the exact file size from the
  * `documents` table alone.
  *
  * Scale shape: partition-at-a-time projection over a binary column —
  * no shuffle, linear in corpus bytes, the [[MultimodalOps]] batch
  * shape.
  */
object Mp4Ops {

  private val mp4InSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType)))

  val mp4BoxSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("brand", StringType),
    StructField("timescale", IntegerType),
    StructField("duration_units", LongType),
    StructField("duration_ms", DoubleType),
    StructField("n_tracks", IntegerType),
    StructField("n_video", IntegerType),
    StructField("n_audio", IntegerType),
    StructField("mdat_bytes", IntegerType),
    StructField("total_bytes", LongType)))

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length + 8)
    out.write(be32(payload.length + 8L))
    out.write(tpe.getBytes("US-ASCII"))
    out.write(payload)
    out.toByteArray
  }

  /** Per-doc ISO-BMFF file: timescale 600·(1 + id%4), duration
    * (3 + id%10)·timescale + (id%7)·30 units, 1 + id%3 tracks whose
    * handler is `vide` when (id + trackIdx) is even else `soun`, mdat
    * of 16 + id%100 ramp bytes. */
  def encodeMp4(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val enc = RowEncoder.encoderFor(mp4InSchema)
    docs.select(col(idCol).cast("long"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val timescale = 600 * (1 + (id % 4).toInt)
          val duration = (3 + id % 10) * timescale + (id % 7) * 30
          val nTracks = (1 + id % 3).toInt
          // mvhd v0: 1 version + 3 flags + 4 creation + 4 modification +
          // 4 timescale + 4 duration + 4 rate + 2 volume + 10 reserved +
          // 36 matrix + 24 predefined + 4 next_track_id = 100 bytes
          val mvhd = {
            val b = new java.io.ByteArrayOutputStream(100)
            b.write(new Array[Byte](4)) // version 0 + flags
            b.write(be32(0)); b.write(be32(0)) // creation/modification
            b.write(be32(timescale.toLong))
            b.write(be32(duration))
            b.write(be32(0x00010000L)) // rate 1.0
            b.write(Array[Byte](0x01, 0x00)) // volume 1.0
            b.write(new Array[Byte](10)) // reserved
            b.write(new Array[Byte](36)) // matrix (zeroed — unused here)
            b.write(new Array[Byte](24)) // pre_defined
            b.write(be32(nTracks + 1L)) // next_track_ID
            box("mvhd", b.toByteArray)
          }
          val traks = (0 until nTracks).map { j =>
            // tkhd v0: 4 ver/flags + 4+4 times + 4 track_ID + 4 reserved
            // + 4 duration + 8 reserved + 2 layer + 2 group + 2 volume +
            // 2 reserved + 36 matrix + 4 width + 4 height = 84 bytes
            val tk = new java.io.ByteArrayOutputStream(84)
            tk.write(new Array[Byte](4))
            tk.write(be32(0)); tk.write(be32(0))
            tk.write(be32(j + 1L))
            tk.write(new Array[Byte](4))
            tk.write(be32(duration))
            tk.write(new Array[Byte](8 + 2 + 2 + 2 + 2 + 36 + 4 + 4))
            val handler = if ((id + j) % 2 == 0) "vide" else "soun"
            // hdlr: 4 ver/flags + 4 pre_defined + 4 handler + 12 reserved
            // + 1 NUL name = 25 bytes
            val hd = new java.io.ByteArrayOutputStream(25)
            hd.write(new Array[Byte](8))
            hd.write(handler.getBytes("US-ASCII"))
            hd.write(new Array[Byte](13))
            box("trak",
              box("tkhd", tk.toByteArray) ++
                box("mdia", box("hdlr", hd.toByteArray)))
          }
          val moov = box("moov", mvhd ++ traks.flatten.toArray)
          val mdatBytes = (16 + id % 100).toInt
          val mdat = box("mdat",
            Array.tabulate(mdatBytes)(i => ((id + i) & 0x7f).toByte))
          val ftyp = box("ftyp",
            "isom".getBytes("US-ASCII") ++ be32(512) ++
              "iso2".getBytes("US-ASCII"))
          Row(id, ftyp ++ moov ++ mdat)
        }
      }(enc)
  }

  /** REAL box walk (see object scaladoc). One row per doc. */
  def parseMp4Boxes(payloads: DataFrame, idCol: String = "doc_id",
                    payloadCol: String = "payload"): DataFrame = {
    val enc = RowEncoder.encoderFor(mp4BoxSchema)
    payloads.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          def u32(at: Int): Long = {
            require(at + 4 <= b.length, s"truncated u32 at $at: doc $id")
            ((b(at) & 0xffL) << 24) | ((b(at + 1) & 0xffL) << 16) |
              ((b(at + 2) & 0xffL) << 8) | (b(at + 3) & 0xffL)
          }
          def u64(at: Int): Long = (u32(at) << 32) | u32(at + 4)
          def boxType(at: Int): String = {
            require(at + 8 <= b.length, s"truncated box header at $at: doc $id")
            new String(b, at + 4, 4, "US-ASCII")
          }
          // walk one box level [from, to); returns (type, payloadStart,
          // payloadEnd) triples in order
          def walk(from: Int, to: Int): Seq[(String, Int, Int)] = {
            val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
            var pos = from
            while (pos < to) {
              val size0 = u32(pos)
              val tpe = boxType(pos)
              // bound the size BEFORE the Int narrowing: a corrupt size
              // above Int.MaxValue would overflow negative, slip past the
              // end <= to check below and die with an
              // ArrayIndexOutOfBoundsException instead of the documented
              // doc-id-tagged failure (ADVICE r10)
              val (start, end) = size0 match {
                case 0 => (pos + 8, to) // box extends to the parent's end
                case 1 =>
                  val sz = u64(pos + 8)
                  require(sz >= 16 && sz <= (to - pos).toLong,
                    s"bad extended box size $sz: doc $id")
                  (pos + 16, pos + sz.toInt)
                case sz =>
                  require(sz >= 8 && sz <= (to - pos).toLong,
                    s"bad box size $sz ($tpe): doc $id")
                  (pos + 8, pos + sz.toInt)
              }
              require(end <= to,
                s"box $tpe overruns its parent ($end > $to): doc $id")
              out += ((tpe, start, end))
              pos = end
            }
            out.toSeq
          }
          val top = walk(0, b.length)
          require(top.nonEmpty && top.head._1 == "ftyp",
            s"not an ISO-BMFF file (no leading ftyp): doc $id")
          val (_, fs, _) = top.head
          val brand = new String(b, fs, 4, "US-ASCII")
          val moov = top.find(_._1 == "moov").getOrElse(
            throw new IllegalArgumentException(s"missing moov: doc $id"))
          val inMoov = walk(moov._2, moov._3)
          val mvhd = inMoov.find(_._1 == "mvhd").getOrElse(
            throw new IllegalArgumentException(s"missing mvhd: doc $id"))
          val ver = b(mvhd._2) & 0xff
          val (timescale, duration) =
            if (ver == 1) (u32(mvhd._2 + 20), u64(mvhd._2 + 24))
            else (u32(mvhd._2 + 12), u32(mvhd._2 + 16))
          require(timescale > 0, s"zero mvhd timescale: doc $id")
          var nVideo = 0; var nAudio = 0; var nTracks = 0
          inMoov.filter(_._1 == "trak").foreach { case (_, ts, te) =>
            nTracks += 1
            val mdia = walk(ts, te).find(_._1 == "mdia").getOrElse(
              throw new IllegalArgumentException(
                s"trak $nTracks has no mdia: doc $id"))
            val hdlr = walk(mdia._2, mdia._3).find(_._1 == "hdlr").getOrElse(
              throw new IllegalArgumentException(
                s"trak $nTracks has no hdlr: doc $id"))
            new String(b, hdlr._2 + 8, 4, "US-ASCII") match {
              case "vide" => nVideo += 1
              case "soun" => nAudio += 1
              case other => throw new IllegalArgumentException(
                s"unknown handler '$other' in trak $nTracks: doc $id")
            }
          }
          val mdat = top.find(_._1 == "mdat").getOrElse(
            throw new IllegalArgumentException(s"missing mdat: doc $id"))
          Row(id, brand, timescale.toInt, duration,
            duration * 1000.0 / timescale, nTracks, nVideo, nAudio,
            mdat._3 - mdat._2, b.length.toLong)
        }
      }(enc)
  }
}
