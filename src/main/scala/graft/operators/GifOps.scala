package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GIF decode — the fourth REAL image codec (BMP/PNG/JPEG live in
  * [[MultimodalOps]]): a palette format with a genuinely different
  * decompression algorithm, variable-code-width LZW. GIF is still
  * everywhere in crawled pages, and its LZW is the same family as TIFF/
  * PDF LZWDecode — owning it rounds out the codec tier.
  *
  * [[encodeGif]] writes real GIF87a files: header, little-endian logical
  * screen descriptor, a 16-entry global color table with closed-form
  * channels, an image descriptor, and an LZW stream in ≤255-byte
  * sub-blocks. The encoder emits one LITERAL code per pixel while
  * tracking the decoder's dictionary growth exactly (a conformant
  * stream that never uses compound codes), so the decoder's code-width
  * escalation path runs on every image larger than the initial table;
  * a CLEAR code opens the stream and EOI closes it per spec.
  * [[decodeGif]] is a REAL LZW decoder: LSB-first bit reader across
  * sub-block boundaries, dictionary seeded with 2^minCodeSize literals
  * + CLEAR + EOI, prev⧺first-char entry construction, code width
  * growth at table-full thresholds, CLEAR reset, the KwKwK case —
  * plus full container validation (magic, descriptor geometry, palette
  * bounds, sub-block framing, trailer). Truncation, bad magic, out-of-
  * range codes and interlaced images fail loudly by doc id.
  *
  * Emitted stats are the [[MultimodalOps.decodePng]] shape (dims,
  * palette size, top-left pixel, per-channel means) with closed-form
  * pixels — pixel k's palette index is (doc_id + 7k) mod 16 and palette
  * entry c is (16c, 255 − 16c, 37c mod 256) — so the DuckDB oracle
  * replays everything and a wrong LZW step, palette read or scan order
  * breaks the hash.
  *
  * Scale shape: partition-at-a-time projection over a binary column —
  * the [[MultimodalOps]] batch shape, no shuffle.
  */
object GifOps {

  private val gifInSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType)))

  val gifStatsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("palette_size", IntegerType),
    StructField("px_r", IntegerType),
    StructField("px_g", IntegerType),
    StructField("px_b", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType)))

  private val paletteSize = 16
  private val minCodeSize = 4 // 2^4 = 16 literal codes

  private def palette(c: Int): (Int, Int, Int) =
    (16 * c, 255 - 16 * c, (37 * c) % 256)

  /** Per-doc GIF87a payload: width 4 + id%5, height 4 + id%3, pixel k's
    * palette index (id + 7k) mod 16 in raster order. */
  def encodeGif(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val enc = RowEncoder.encoderFor(gifInSchema)
    docs.select(col(idCol).cast("long"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val w = 4 + (id % 5).toInt
          val h = 4 + (id % 3).toInt
          val out = new java.io.ByteArrayOutputStream()
          def u16le(v: Int): Unit = { out.write(v & 0xff); out.write(v >> 8) }
          out.write("GIF87a".getBytes("US-ASCII"))
          u16le(w); u16le(h)
          // packed: global table present, color resolution 7, size bits 3
          // (2^(3+1) = 16 entries)
          out.write(0x80 | (7 << 4) | 3)
          out.write(0) // background color index
          out.write(0) // aspect ratio
          (0 until paletteSize).foreach { c =>
            val (pr, pg, pb) = palette(c)
            out.write(pr); out.write(pg); out.write(pb)
          }
          out.write(0x2c) // image descriptor
          u16le(0); u16le(0); u16le(w); u16le(h)
          out.write(0) // no local table, not interlaced
          out.write(minCodeSize)
          // LZW: literal-only codes with exact decoder-side dict tracking
          val bits = new java.io.ByteArrayOutputStream()
          var acc = 0L; var nbits = 0
          var codeSize = minCodeSize + 1
          val clear = 1 << minCodeSize
          val eoi = clear + 1
          var dictSize = eoi + 1
          def put(code: Int): Unit = {
            acc |= code.toLong << nbits; nbits += codeSize
            while (nbits >= 8) {
              bits.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8
            }
          }
          put(clear)
          var k = 0
          val n = w * h
          while (k < n) {
            put(((id + 7L * k) % paletteSize).toInt)
            // after the decoder consumes the 2nd..nth literal it adds a
            // dictionary entry; the code width grows when the NEXT code
            // could address the now-larger table
            if (k > 0) {
              dictSize += 1
              if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
            }
            k += 1
          }
          put(eoi)
          if (nbits > 0) bits.write((acc & 0xff).toInt)
          val lzw = bits.toByteArray
          var off = 0
          while (off < lzw.length) {
            val len = math.min(255, lzw.length - off)
            out.write(len); out.write(lzw, off, len)
            off += len
          }
          out.write(0) // block terminator
          out.write(0x3b) // trailer
          Row(id, out.toByteArray)
        }
      }(enc)
  }

  /** The shared container + LZW walk: (width, height, palette, pixel
    * palette-indices in raster order). [[decodeGif]] projects stats from
    * it; [[aHashGif]] fingerprints the same pixels. */
  private[graft] def decodeGifPixels(id: Long, b: Array[Byte])
      : (Int, Int, Array[(Int, Int, Int)], Array[Int]) = {
    var pos = 0
          def u8(): Int = {
            require(pos < b.length, s"truncated GIF at $pos: doc $id")
            val v = b(pos) & 0xff; pos += 1; v
          }
          def u16le(): Int = { val lo = u8(); lo | (u8() << 8) }
          require(b.length >= 6 &&
            new String(b, 0, 6, "US-ASCII").matches("GIF8[79]a"),
            s"not a GIF (bad magic): doc $id")
          pos = 6
          val w = u16le(); val h = u16le()
          require(w > 0 && h > 0, s"bad dimensions ${w}x$h: doc $id")
          val packed = u8()
          u8(); u8() // background, aspect
          require((packed & 0x80) != 0, s"no global color table: doc $id")
          val palSize = 1 << ((packed & 0x07) + 1)
          val pal = Array.tabulate(palSize)(_ => (u8(), u8(), u8()))
          require(u8() == 0x2c, s"expected image descriptor: doc $id")
          require(u16le() == 0 && u16le() == 0,
            s"nonzero image offset unsupported: doc $id")
          require(u16le() == w && u16le() == h,
            s"image geometry != screen geometry: doc $id")
          val ipacked = u8()
          require((ipacked & 0x40) == 0, s"interlaced GIF: doc $id")
          require((ipacked & 0x80) == 0, s"local color table: doc $id")
          val minCode = u8()
          require(minCode >= 2 && minCode <= 11,
            s"bad LZW min code size $minCode: doc $id")
          // concatenate sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          var blk = u8()
          while (blk != 0) {
            require(pos + blk <= b.length,
              s"sub-block overruns payload: doc $id")
            data.write(b, pos, blk); pos += blk
            blk = u8()
          }
          require(u8() == 0x3b, s"missing trailer: doc $id")
          // ---- LZW ----
          val stream = data.toByteArray
          val clear = 1 << minCode
          val eoi = clear + 1
          var codeSize = minCode + 1
          var acc = 0L; var nbits = 0; var sp = 0
          def next(): Int = {
            while (nbits < codeSize) {
              require(sp < stream.length,
                s"LZW stream underflow: doc $id")
              acc |= (stream(sp) & 0xffL) << nbits; sp += 1; nbits += 8
            }
            val v = (acc & ((1L << codeSize) - 1)).toInt
            acc >>= codeSize; nbits -= codeSize
            v
          }
          val px = new Array[Int](w * h)
          var np = 0
          var dict = Array.fill[Array[Int]](4096)(null)
          def reset(): Unit = {
            dict = Array.fill[Array[Int]](4096)(null)
            (0 until clear).foreach(c => dict(c) = Array(c))
            codeSize = minCode + 1
          }
          reset()
          var dictSize = eoi + 1
          var prev: Array[Int] = null
          var done = false
          while (!done) {
            val code = next()
            if (code == clear) { reset(); dictSize = eoi + 1; prev = null }
            else if (code == eoi) done = true
            else {
              val entry =
                if (code < dictSize && dict(code) != null) dict(code)
                else if (code == dictSize && prev != null)
                  prev :+ prev(0) // the KwKwK case
                else throw new IllegalArgumentException(
                  s"LZW code $code out of range (dict $dictSize): doc $id")
              require(np + entry.length <= px.length,
                s"LZW output exceeds ${w}x$h pixels: doc $id")
              entry.foreach { v => px(np) = v; np += 1 }
              if (prev != null && dictSize < 4096) {
                dict(dictSize) = prev :+ entry(0)
                dictSize += 1
                if (dictSize == (1 << codeSize) && codeSize < 12)
                  codeSize += 1
              }
              prev = entry
            }
          }
          require(np == w * h, s"LZW decoded $np of ${w * h} pixels: doc $id")
          px.foreach(c => require(c < palSize,
            s"pixel index $c outside the $palSize-entry palette: doc $id"))
    (w, h, pal, px)
  }

  /** REAL GIF87a + LZW decode (see object scaladoc). One row per doc. */
  def decodeGif(payloads: DataFrame, idCol: String = "doc_id",
                payloadCol: String = "payload"): DataFrame = {
    val enc = RowEncoder.encoderFor(gifStatsSchema)
    payloads.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (w, h, pal, px) =
            decodeGifPixels(id, r.getAs[Array[Byte]](1))
          var sr = 0L; var sg = 0L; var sb2 = 0L
          px.foreach { c =>
            val (pr, pg, pb) = pal(c); sr += pr; sg += pg; sb2 += pb
          }
          val n = (w * h).toDouble
          def r6(v: Double): Double =
            graft.functions.GraftFunctions.round6(v)
          val (r0, g0, b0) = pal(px(0))
          Row(id, w, h, pal.length, r0, g0, b0,
            r6(sr / n), r6(sg / n), r6(sb2 / n))
        }
      }(enc)
  }

  /** Image-dedup fingerprint over DECODED GIF pixels — the palette-format
    * member of the format-agnostic aHash family ([[MultimodalOps.aHash]]
    * for BMP/PNG, [[MultimodalOps.aHashJpeg]]): per-pixel integer luma
    * (r+g+b via the palette), bit k set iff luma_k·n > Σluma (no
    * division), LSB-first in raster order — so GIF payloads feed the
    * same banded-Hamming near-dup pass as every other image format. */
  def aHashGif(payloads: DataFrame, idCol: String = "doc_id",
               payloadCol: String = "payload"): DataFrame = {
    val enc = RowEncoder.encoderFor(MultimodalOps.aHashSchema)
    payloads.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (w, h, pal, px) =
            decodeGifPixels(id, r.getAs[Array[Byte]](1))
          val n = w * h
          require(n >= 1 && n <= 63, s"aHashGif needs 1..63 px, got $n: doc $id")
          val luma = px.map { c =>
            val (pr, pg, pb) = pal(c); (pr + pg + pb).toLong
          }
          val total = luma.sum
          var hash = 0L
          var k = 0
          while (k < n) {
            if (luma(k) * n > total) hash |= (1L << k)
            k += 1
          }
          Row(id, w, h, n, hash)
        }
      }(enc)
  }
}
