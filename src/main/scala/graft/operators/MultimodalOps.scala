package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata (builder brief).
  *
  * The decode path is REAL for uncompressed 24-bit BMP ([[decodeBmp]]):
  * magic/offset/dimension header parse, little-endian multi-byte fields,
  * 4-byte row-stride padding, bottom-up row order, per-channel pixel
  * statistics — everything an image decoder must get right short of
  * entropy coding. Compressed codecs (JPEG/PNG/PCM) are not in this
  * container; they would slot into the same `mapPartitions` batch shape
  * with the same output schema. At 100 TB payloads are processed
  * partition-at-a-time with zero driver involvement, and the stats schema
  * is columnar so downstream training readers prune it.
  */
object MultimodalOps {

  /** Attach a binary payload column (here: the UTF-8 bytes of `text`; in
    * production the bytes come off the object store). */
  def withPayload(df: DataFrame, sourceCol: String = "text"): DataFrame =
    df.withColumn("payload", col(sourceCol).cast("binary"))

  /** Payload metadata: byte length, content digest, magic-prefix sniff —
    * pure expressions, no decode needed. */
  def payloadMetadata(df: DataFrame): DataFrame =
    df
      .withColumn("n_bytes", length(col("payload")))
      .withColumn("digest", md5(col("payload")))
      .withColumn("magic", hex(substring(col("payload"), 1, 4)))

  /** Frame sampling: split the payload into fixed-size byte frames — the
    * video/audio access pattern (seek to frame k) expressed as pure
    * columnar ops. One row per (doc, frame) with its digest; the digest is
    * md5 over the frame's hex form so any SQL engine reproduces it.
    * Explode + substring are codegen'd; no data leaves the executor. */
  def frameSample(df: DataFrame, frameBytes: Int = 64): DataFrame =
    df
      .withColumn("n_bytes", length(col("payload")))
      .withColumn("frame_idx",
        explode(sequence(lit(0),
          ceil(col("n_bytes").cast("double") / frameBytes).cast("int") - 1)))
      .withColumn("frame",
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)"))
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame")).as("frame_len"),
        md5(hex(col("frame")).cast("binary")).as("frame_digest"))

  /** Resize: downsample the payload to exactly `targetBytes` by strided
    * byte sampling — the stand-in for an image resize (same contract: fixed
    * output size regardless of input size, deterministic). Pure columnar
    * (no UDF): an index sequence drives `substring` picks, all codegen'd.
    * A production deploy swaps the byte stride for the codec's scaler and
    * keeps the fixed-width binary output schema. */
  def resizePayload(df: DataFrame, targetBytes: Int = 32): DataFrame = {
    val hx = hex(col("payload"))
    val n = length(col("payload"))
    // strided picks in hex space (2 chars = 1 byte); shorter payloads are
    // right-padded with 0x20 to the fixed width
    // i*n in LONG: an int product overflows past ~69 MB payloads (ANSI is
    // off, so it would wrap silently into garbage picks)
    val picks = transform(sequence(lit(0), lit(targetBytes - 1)),
      i => hx.substr(
        (floor(i.cast("long") * n / targetBytes) * 2 + 1).cast("int"), lit(2)))
    df
      .withColumn("n_bytes", n)
      .withColumn("rhex",
        when(n >= targetBytes, array_join(picks, ""))
          .otherwise(rpad(hx, targetBytes * 2, "20")))
      .select(col("doc_id"), col("n_bytes"),
        (length(col("rhex")) / 2).cast("int").as("resized_len"),
        md5(col("rhex").cast("binary")).as("resized_digest"))
  }

  private val payloadSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType)))

  val bmpStatsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("bpp", IntegerType),
    StructField("px_b", IntegerType),
    StructField("px_g", IntegerType),
    StructField("px_r", IntegerType),
    StructField("mean_b", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_r", DoubleType)))

  private val BmpHeaderBytes = 54 // BITMAPFILEHEADER(14) + BITMAPINFOHEADER(40)

  /** Synthesize a REAL uncompressed 24-bit BMP per doc (the image corpus
    * fixture this container can't download). Dimensions and pixel channels
    * are closed-form functions of (doc_id, pixel index), so the DuckDB
    * oracle verifies [[decodeBmp]] END TO END: if the decoder misreads a
    * little-endian field, the stride padding, or the bottom-up row order,
    * the decoded stats stop matching the formulas. Same `mapPartitions`
    * batch shape a production encoder/codec uses. */
  def encodeBmp(payloads: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val enc = RowEncoder.encoderFor(payloadSchema)
    payloads.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map(r => Row(r.getLong(0), bmpBytes(r.getLong(0))))
    }(enc)
  }

  /** One deterministic BMP: width 4–8, height 4–6, pixel k's (B, G, R) =
    * (id·7 + k·13, id·11 + k·17, id·3 + k·19) mod 256 — trivially
    * replayable in SQL, non-trivially laid out in bytes (bottom-up rows,
    * stride padded to 4). */
  private[graft] def bmpBytes(id: Long): Array[Byte] = {
    val w = (4 + id % 5).toInt
    val h = (4 + id % 3).toInt
    val stride = ((3 * w + 3) / 4) * 4
    val size = BmpHeaderBytes + stride * h
    val buf = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(size)
      .putShort(0).putShort(0).putInt(BmpHeaderBytes)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(stride * h).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var s = 0
    while (s < h) {
      val row = h - 1 - s // bottom-up: storage row s holds image row h-1-s
      var c = 0
      while (c < w) {
        val k = row * w + c
        buf.put(((id * 7 + k * 13) % 256).toByte)
        buf.put(((id * 11 + k * 17) % 256).toByte)
        buf.put(((id * 3 + k * 19) % 256).toByte)
        c += 1
      }
      var pad = 3 * w
      while (pad < stride) { buf.put(0.toByte); pad += 1 }
      s += 1
    }
    buf.array()
  }

  // cross-engine HALF_UP rounding shared with every op module
  import graft.functions.GraftFunctions.round6

  /** REAL BMP decode over binary payloads, partition-at-a-time: validates
    * the magic, reads the little-endian header (pixel offset, dimensions,
    * bit depth), walks the pixel grid honoring the 4-byte row stride and
    * bottom-up row order, and emits header fields + the top-left pixel +
    * per-channel means. Top-left is the layout sentinel: it lives in the
    * LAST stored row, so a row-order bug is caught by the oracle even
    * though means are order-blind. Supports the uncompressed 24-bit
    * BI_RGB profile (what [[encodeBmp]] and most raw tooling emit). */
  def decodeBmp(payloads: DataFrame, idCol: String = "doc_id",
                payloadCol: String = "payload"): DataFrame = {
    val enc = RowEncoder.encoderFor(bmpStatsSchema)
    payloads.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          require(bytes.length >= BmpHeaderBytes &&
            bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte,
            s"not a BMP payload: doc $id")
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val offset = bb.getInt(10)
          val w = bb.getInt(18)
          val rawH = bb.getInt(22) // negative height = top-down layout
          val bpp = bb.getShort(28).toInt
          val compression = bb.getInt(30)
          require(bpp == 24 && compression == 0,
            s"unsupported BMP profile (bpp=$bpp compression=$compression): doc $id")
          val h = math.abs(rawH)
          val bottomUp = rawH > 0
          val stride = ((3 * w + 3) / 4) * 4
          // a truncated payload must fail with a diagnosable doc id, not an
          // ArrayIndexOutOfBounds from the middle of the pixel loop
          require(bytes.length >= offset + stride * h,
            s"truncated BMP (${bytes.length} bytes < ${offset + stride * h}): doc $id")
          var sb = 0L; var sg = 0L; var sr = 0L
          var s = 0
          while (s < h) {
            var c = 0
            val base = offset + s * stride
            while (c < w) {
              sb += bytes(base + 3 * c) & 0xff
              sg += bytes(base + 3 * c + 1) & 0xff
              sr += bytes(base + 3 * c + 2) & 0xff
              c += 1
            }
            s += 1
          }
          val tl = offset + (if (bottomUp) (h - 1) * stride else 0)
          val n = (w * h).toDouble
          Row(id, bytes.length, w, h, bpp,
            bytes(tl) & 0xff, bytes(tl + 1) & 0xff, bytes(tl + 2) & 0xff,
            round6(sb / n), round6(sg / n), round6(sr / n))
        }
      }(enc)
  }

  private val WavHeaderBytes = 44 // RIFF(12) + fmt(24) + data header(8)

  /** One deterministic mono 16-bit PCM WAV: n = 32 + id%17 samples at
    * 8 kHz, sample k = ((id·31 + k·57) mod 4096) − 2048 — closed-form
    * waveform in a REAL RIFF container (little-endian int16 frames), the
    * audio twin of [[bmpBytes]]. */
  private[graft] def wavBytes(id: Long): Array[Byte] = {
    val n = (32 + id % 17).toInt
    val dataSize = 2 * n
    val buf = java.nio.ByteBuffer.allocate(WavHeaderBytes + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(8000).putInt(16000) // sample rate, byte rate
      .putShort(2).putShort(16) // block align, bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var k = 0
    while (k < n) {
      buf.putShort((((id * 31 + k * 57) % 4096) - 2048).toShort)
      k += 1
    }
    buf.array()
  }

  /** Synthesize the WAV corpus — same `mapPartitions` batch shape as
    * [[encodeBmp]]. */
  def encodeWav(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val enc = RowEncoder.encoderFor(payloadSchema)
    docs.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map(r => Row(r.getLong(0), wavBytes(r.getLong(0))))
    }(enc)
  }

  val wavStatsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_samples", IntegerType),
    StructField("first_sample", IntegerType),
    StructField("peak", IntegerType),
    StructField("sum_sample", LongType),
    StructField("energy", LongType),
    StructField("zero_crossings", IntegerType)))

  /** REAL WAV decode: RIFF/WAVE magic, fmt chunk (PCM, mono, 16-bit),
    * little-endian int16 frames — then integer waveform features (peak,
    * exact sum, Σs² energy, sign-change zero crossings). Everything is
    * integer arithmetic, so the oracle replays the closed-form waveform
    * with no rounding doctrine at all. */
  /** Walk the RIFF chunk list (from offset 12): byte offsets of the fmt
    * and data chunk BODIES plus the data size. Real WAVs carry
    * LIST/INFO/fact chunks between fmt and data, so a fixed-offset parse
    * breaks on perfectly valid files; chunks are word-aligned (odd sizes
    * pad one byte). */
  private[graft] def wavChunks(bytes: Array[Byte], id: Long): (Int, Int, Int) = {
    require(bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
      bytes(10) == 'V' && bytes(11) == 'E',
      s"not a RIFF/WAVE payload: doc $id")
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var fmtOff = -1
    var dataOff = -1
    var dataSize = 0
    while (off + 8 <= bytes.length && (fmtOff < 0 || dataOff < 0)) {
      val cid = new String(bytes, off, 4, "US-ASCII")
      val sz = bb.getInt(off + 4)
      require(sz >= 0 && off + 8 + sz <= bytes.length,
        s"truncated '$cid' chunk (size=$sz) in WAV: doc $id")
      if (cid == "fmt ") fmtOff = off + 8
      else if (cid == "data") { dataOff = off + 8; dataSize = sz }
      off += 8 + sz + (sz & 1)
    }
    require(fmtOff >= 0 && dataOff >= 0,
      s"missing fmt/data chunk in WAV: doc $id")
    (fmtOff, dataOff, dataSize)
  }

  def decodeWav(payloads: DataFrame, idCol: String = "doc_id",
                payloadCol: String = "payload"): DataFrame = {
    val enc = RowEncoder.encoderFor(wavStatsSchema)
    payloads.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (fmtOff, dataOff, dataSize) = wavChunks(bytes, id)
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val fmt = bb.getShort(fmtOff).toInt
          val channels = bb.getShort(fmtOff + 2).toInt
          val rate = bb.getInt(fmtOff + 4)
          val bits = bb.getShort(fmtOff + 14).toInt
          require(fmt == 1 && channels == 1 && bits == 16,
            s"unsupported WAV profile (fmt=$fmt ch=$channels bits=$bits): doc $id")
          val n = dataSize / 2
          var k = 0
          var peak = 0
          var sum = 0L
          var energy = 0L
          var zc = 0
          var first = 0
          var prevNonNeg = false
          while (k < n) {
            val s = bb.getShort(dataOff + 2 * k).toInt
            if (k == 0) { first = s; prevNonNeg = s >= 0 }
            val nonNeg = s >= 0
            if (k > 0 && nonNeg != prevNonNeg) zc += 1
            prevNonNeg = nonNeg
            if (math.abs(s) > peak) peak = math.abs(s)
            sum += s
            energy += s.toLong * s
            k += 1
          }
          Row(id, bytes.length, rate, n, first, peak, sum, energy, zc)
        }
      }(enc)
  }

  val wavFrameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame_n", IntegerType),
    StructField("frame_energy", LongType)))

  /** Framed Σs² energy over the decoded waveform (the spectrogram-prep
    * access pattern): one row per `frameSamples`-sample frame, integer
    * energy — flatMap inside the same partition-local batch decode. */
  def wavFrameEnergy(payloads: DataFrame, frameSamples: Int = 16,
                     idCol: String = "doc_id",
                     payloadCol: String = "payload"): DataFrame = {
    require(frameSamples > 0, s"frameSamples must be positive: $frameSamples")
    val enc = RowEncoder.encoderFor(wavFrameSchema)
    payloads.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (_, dataOff, dataSize) = wavChunks(bytes, id)
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val n = dataSize / 2
          (0 until (n + frameSamples - 1) / frameSamples).map { f =>
            var k = f * frameSamples
            val end = math.min(k + frameSamples, n)
            var e = 0L
            while (k < end) {
              val s = bb.getShort(dataOff + 2 * k).toInt
              e += s.toLong * s
              k += 1
            }
            Row(id, f, end - f * frameSamples, e)
          }
        }
      }(enc)
  }

  val wavFpSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_samples", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("fp", LongType)))

  /** Audio dedup fingerprint — the waveform sibling of [[aHashJpeg]]:
    * one bit per [[wavFrameEnergy]] frame, set iff the frame's Σs²
    * energy exceeds the track's per-sample mean energy — compared
    * cross-multiplied (`frameEnergy·totalSamples >
    * totalEnergy·frameLen`) so partial last frames weigh correctly and
    * no division is involved; packed LSB-first in frame order, ≤63
    * frames per BIGINT (at production framing, one fingerprint per
    * fixed-length chunk). Banded Hamming near-dup runs the
    * [[aHashNearDups]] pattern over (fp, n_frames). */
  def wavFingerprint(payloads: DataFrame, frameSamples: Int = 16,
                     idCol: String = "doc_id",
                     payloadCol: String = "payload"): DataFrame = {
    require(frameSamples > 0, s"frameSamples must be positive: $frameSamples")
    val enc = RowEncoder.encoderFor(wavFpSchema)
    payloads.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (_, dataOff, dataSize) = wavChunks(bytes, id)
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val n = dataSize / 2
          val nf = (n + frameSamples - 1) / frameSamples
          require(nf >= 1 && nf <= 63,
            s"wavFingerprint needs 1..63 frames, got $nf: doc $id")
          val fe = new Array[Long](nf)
          val fn = new Array[Int](nf)
          var total = 0L
          var k = 0
          while (k < n) {
            val s = bb.getShort(dataOff + 2 * k).toInt
            val f = k / frameSamples
            fe(f) += s.toLong * s; fn(f) += 1; total += s.toLong * s
            k += 1
          }
          var fp = 0L
          var f = 0
          while (f < nf) {
            // cross-multiplied energy compare: fe ≤ frameSamples·2^30 and
            // n ≤ 63·frameSamples, so fe*n overflows Long past frameSamples
            // ≈ 12k full-scale samples — go exact via BigInt once the
            // operands could overflow (nf ≤ 63 compares/doc, cost is nil)
            val gt =
              if (fe(f) <= Long.MaxValue / math.max(n, 1) &&
                  total <= Long.MaxValue / math.max(fn(f), 1))
                fe(f) * n > total * fn(f)
              else BigInt(fe(f)) * n > BigInt(total) * fn(f)
            if (gt) fp |= (1L << f)
            f += 1
          }
          Row(id, n, nf, fp)
        }
      }(enc)
  }

  val aHashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("w", IntegerType),
    StructField("h", IntegerType),
    StructField("n_px", IntegerType),
    StructField("ahash", LongType)))

  /** Perceptual average-hash over a decoded BMP payload: per-pixel integer
    * luma (B+G+R), bit k set iff pixel k's luma exceeds the image mean —
    * compared EXACTLY as `luma·n > Σluma` so no division is involved —
    * packed LSB-first in IMAGE row-major order (top row first, so the
    * bottom-up storage order must be undone; a row-order bug flips the
    * whole bit layout and the oracle hash). Image sizes here are ≤ 48
    * pixels, so the hash fits one BIGINT.
    *
    * Same `mapPartitions` batch shape as [[decodeBmp]]; at 100 TB this is
    * a partition-local pass with a 5-column integer output — the
    * image-dedup fingerprint table. */
  def aHash(payloads: DataFrame, idCol: String = "doc_id",
            payloadCol: String = "payload"): DataFrame = {
    val enc = RowEncoder.encoderFor(aHashSchema)
    payloads.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          require(bytes.length >= BmpHeaderBytes &&
            bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte,
            s"not a BMP payload: doc $id")
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val offset = bb.getInt(10)
          val w = bb.getInt(18)
          val rawH = bb.getInt(22)
          val h = math.abs(rawH)
          val bottomUp = rawH > 0
          val stride = ((3 * w + 3) / 4) * 4
          require(bytes.length >= offset + stride * h,
            s"truncated BMP (${bytes.length} bytes): doc $id")
          val n = w * h
          require(n <= 63, s"aHash needs <= 63 pixels, got $n: doc $id")
          val luma = new Array[Long](n)
          var total = 0L
          var r2 = 0
          while (r2 < h) {
            val s = if (bottomUp) h - 1 - r2 else r2 // undo storage order
            val base = offset + s * stride
            var c = 0
            while (c < w) {
              val l = (bytes(base + 3 * c) & 0xff) +
                (bytes(base + 3 * c + 1) & 0xff) +
                (bytes(base + 3 * c + 2) & 0xff)
              luma(r2 * w + c) = l
              total += l
              c += 1
            }
            r2 += 1
          }
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

  /** Hamming near-duplicate pairs over [[aHash]] fingerprints: the hash is
    * cut into `nBands` bit-bands, candidates come from a (band, bucket,
    * w, h) equi-join (images of different dimensions never compare), and
    * the exact `bit_count(xor)` confirms. Banding is EXACT for
    * `maxDist < nBands` (pigeonhole: fewer flipped bits than bands leaves
    * one band untouched), so recall is 1 — the simhashNearDups doctrine
    * on the image fingerprint. One hash-join shuffle; no pair leaves a
    * bucket. */
  def aHashNearDups(hashes: DataFrame, maxDist: Int = 2, bandBits: Int = 12,
                    nBands: Int = 4): DataFrame = {
    require(maxDist < nBands,
      s"banding is only exact for maxDist < nBands: $maxDist >= $nBands")
    val bands = hashes.select(col("doc_id"), col("w"), col("h"),
        col("ahash"),
        explode(array((0 until nBands).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("ahash"), bandBits * b)
              .bitwiseAND(lit((1L << bandBits) - 1)).as("bucket"))): _*))
          .as("bb"))
      .select(col("doc_id"), col("w"), col("h"), col("ahash"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val left = bands.select(col("band"), col("bucket"), col("w"), col("h"),
      col("doc_id").as("doc_a"), col("ahash").as("ha"))
    val right = bands.select(col("band"), col("bucket"), col("w"), col("h"),
      col("doc_id").as("doc_b"), col("ahash").as("hb"))
    left.join(right, Seq("band", "bucket", "w", "h"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("ha"), col("hb"))
      .distinct()
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int").as("dist"))
      .filter(col("dist") <= maxDist)
  }

  // ------------------------------------------------------------------
  // PNG: a real compressed image codec (zlib DEFLATE via java.util.zip +
  // the five scanline filters) — the step past BMP's uncompressed parse.

  val pngStatsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("bit_depth", IntegerType),
    StructField("color_type", IntegerType),
    StructField("n_raw", IntegerType),
    StructField("px_r", IntegerType),
    StructField("px_g", IntegerType),
    StructField("px_b", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType)))

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def pngChunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(12 + data.length) // big-endian
    out.putInt(data.length).put(tag.getBytes("US-ASCII")).put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(tag.getBytes("US-ASCII")); crc.update(data)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  /** Channels per pixel for the supported 8-bit color types: 0 gray,
    * 2 RGB, 6 RGBA. */
  private def pngBpp(colorType: Int): Int = colorType match {
    case 0 => 1
    case 2 => 3
    case 6 => 4
    case ct => throw new IllegalArgumentException(s"color type $ct")
  }

  /** Serialize one 8-bit non-interlaced PNG from a per-(pixel, channel)
    * closed form. Scanline filters CYCLE 0..4 by row (None, Sub, Up,
    * Average, Paeth) with the LEFT offset at the color type's bpp, so
    * decode exercises every reconstruction branch at every pixel width;
    * IDAT is genuinely DEFLATEd. */
  private def pngFromPixels(w: Int, h: Int, colorType: Int,
                            px: (Int, Int) => Int): Array[Byte] = {
    val bpp = pngBpp(colorType)
    val bpr = bpp * w
    val raw = Array.ofDim[Byte](h, bpr)
    var row = 0
    while (row < h) {
      var c = 0
      while (c < w) {
        val k = row * w + c
        var ch = 0
        while (ch < bpp) {
          raw(row)(bpp * c + ch) = px(k, ch).toByte
          ch += 1
        }
        c += 1
      }
      row = row + 1
    }
    val filtered = new java.io.ByteArrayOutputStream()
    row = 0
    while (row < h) {
      val ft = row % 5
      filtered.write(ft)
      var x = 0
      while (x < bpr) {
        val cur = raw(row)(x) & 0xff
        val left = if (x >= bpp) raw(row)(x - bpp) & 0xff else 0
        val up = if (row > 0) raw(row - 1)(x) & 0xff else 0
        val ul = if (row > 0 && x >= bpp) raw(row - 1)(x - bpp) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case _ => paeth(left, up, ul)
        }
        filtered.write((cur - pred) & 0xff)
        x += 1
      }
      row += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered.toByteArray)
    deflater.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](512)
    while (!deflater.finished())
      comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    out.write(pngChunk("IHDR", ihdr))
    out.write(pngChunk("IDAT", comp.toByteArray))
    out.write(pngChunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** One deterministic 8-bit RGB PNG (color type 2, non-interlaced):
    * [[bmpBytes]]'s dimensions and channel closed forms, stored in PNG's
    * RGB order, TOP-DOWN rows. */
  private[graft] def pngBytes(id: Long): Array[Byte] = {
    val w = (4 + id % 5).toInt
    val h = (4 + id % 3).toInt
    pngFromPixels(w, h, 2, (k, ch) => ch match {
      case 0 => ((id * 3 + k * 19) % 256).toInt
      case 1 => ((id * 11 + k * 17) % 256).toInt
      case _ => ((id * 7 + k * 13) % 256).toInt
    })
  }

  /** Grayscale PNG (color type 0 — icons/scans): one channel, so the
    * Sub/Paeth LEFT offset is 1 byte, a different reconstruction
    * geometry than RGB's 3. */
  private[graft] def pngBytesGray(id: Long): Array[Byte] = {
    val w = (4 + id % 5).toInt
    val h = (4 + id % 3).toInt
    pngFromPixels(w, h, 0, (k, _) => ((id * 5 + k * 23) % 256).toInt)
  }

  /** RGBA PNG (color type 6 — what web transparency actually ships):
    * RGB closed forms as [[pngBytes]] plus an alpha plane that rides
    * through the 4-byte filter geometry (a wrong bpp corrupts the RGB
    * reconstruction, so alpha is load-bearing even though the emitted
    * stats are RGB). */
  private[graft] def pngBytesRgba(id: Long): Array[Byte] = {
    val w = (4 + id % 5).toInt
    val h = (4 + id % 3).toInt
    pngFromPixels(w, h, 6, (k, ch) => ch match {
      case 0 => ((id * 3 + k * 19) % 256).toInt
      case 1 => ((id * 11 + k * 17) % 256).toInt
      case 2 => ((id * 7 + k * 13) % 256).toInt
      case _ => ((id * 13 + k * 7) % 256).toInt
    })
  }

  /** Production ingest path for binary payloads: Spark's `binaryFile`
    * source over a directory of media files (object-store listing at
    * scale), doc_id parsed from the file stem. Columns: (doc_id, payload)
    * — the exact shape [[decodeBmp]]/[[decodePng]]/[[decodeWav]] consume,
    * so `readPayloadFiles(...) |> decodePng` is the real pipeline.
    * `pathGlobFilter` prunes at the LISTING, before any bytes move. */
  def readPayloadFiles(spark: SparkSession, dir: String,
                       glob: String = "*.png"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.[A-Za-z0-9]+$", 1)
          .cast("long").as("doc_id"),
        col("content").as("payload"))

  /** Synthesize the PNG payload column (the compressed-image fixture). */
  def encodePng(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val enc = RowEncoder.encoderFor(payloadSchema)
    docs.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map(r => Row(r.getLong(0), pngBytes(r.getLong(0))))
    }(enc)
  }

  /** Synthesize the grayscale PNG payload column. */
  def encodePngGray(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val enc = RowEncoder.encoderFor(payloadSchema)
    docs.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map(r => Row(r.getLong(0), pngBytesGray(r.getLong(0))))
    }(enc)
  }

  /** Synthesize the RGBA PNG payload column. */
  def encodePngRgba(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val enc = RowEncoder.encoderFor(payloadSchema)
    docs.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map(r => Row(r.getLong(0), pngBytesRgba(r.getLong(0))))
    }(enc)
  }

  /** REAL PNG decode, partition-at-a-time: signature check, chunk walk
    * with CRC32 VALIDATION on every chunk, big-endian IHDR parse, IDAT
    * concatenation + INFLATE, and full scanline-filter reconstruction
    * (None/Sub/Up/Average/Paeth) — the complete critical-chunk profile
    * for 8-bit RGB non-interlaced. Emits header fields, the inflated
    * byte count, the top-left pixel (the layout sentinel) and per-channel
    * means. Unsupported profiles and corrupt CRCs fail loudly with the
    * doc id. */
  def decodePng(payloads: DataFrame, idCol: String = "doc_id",
                payloadCol: String = "payload"): DataFrame = {
    val enc = RowEncoder.encoderFor(pngStatsSchema)
    payloads.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          require(bytes.length > 8 && PngSig.indices.forall(i =>
            bytes(i) == PngSig(i)), s"not a PNG payload: doc $id")
          val bb = java.nio.ByteBuffer.wrap(bytes) // PNG is big-endian
          bb.position(8)
          var w = 0; var h = 0; var bitDepth = 0; var colorType = 0
          val idat = new java.io.ByteArrayOutputStream()
          var done = false
          while (!done) {
            require(bb.remaining() >= 12, s"truncated PNG chunk: doc $id")
            val len = bb.getInt
            val tag = new Array[Byte](4); bb.get(tag)
            require(bb.remaining() >= len + 4,
              s"truncated PNG chunk body: doc $id")
            val data = new Array[Byte](len); bb.get(data)
            val stored = bb.getInt
            val crc = new java.util.zip.CRC32()
            crc.update(tag); crc.update(data)
            require(crc.getValue.toInt == stored,
              s"PNG CRC mismatch in ${new String(tag, "US-ASCII")}: doc $id")
            new String(tag, "US-ASCII") match {
              case "IHDR" =>
                val hb = java.nio.ByteBuffer.wrap(data)
                w = hb.getInt; h = hb.getInt
                bitDepth = hb.get() & 0xff; colorType = hb.get() & 0xff
                val interlace = data(12) & 0xff
                require(bitDepth == 8 && interlace == 0 &&
                  (colorType == 0 || colorType == 2 || colorType == 6),
                  s"unsupported PNG profile (depth=$bitDepth color=$colorType " +
                    s"interlace=$interlace): doc $id")
              case "IDAT" => idat.write(data)
              case "IEND" => done = true
              case _ => () // ancillary chunks skipped (CRC still checked)
            }
          }
          val bpp = pngBpp(colorType)
          val bpr = bpp * w
          val nRaw = h * (1 + bpr)
          val inflater = new java.util.zip.Inflater()
          inflater.setInput(idat.toByteArray)
          val stream = new Array[Byte](nRaw)
          var off = 0
          while (off < nRaw && !inflater.finished()) {
            val n = inflater.inflate(stream, off, nRaw - off)
            require(n > 0 || inflater.finished(),
              s"underflowing PNG inflate at $off/$nRaw: doc $id")
            off += n
          }
          inflater.end()
          require(off == nRaw,
            s"PNG pixel stream short ($off of $nRaw bytes): doc $id")
          val raw = Array.ofDim[Byte](h, bpr)
          var row = 0
          while (row < h) {
            val base = row * (1 + bpr)
            val ft = stream(base) & 0xff
            require(ft <= 4, s"unknown PNG filter $ft: doc $id")
            var x = 0
            while (x < bpr) {
              val enc0 = stream(base + 1 + x) & 0xff
              val left = if (x >= bpp) raw(row)(x - bpp) & 0xff else 0
              val up = if (row > 0) raw(row - 1)(x) & 0xff else 0
              val ul = if (row > 0 && x >= bpp) raw(row - 1)(x - bpp) & 0xff
                       else 0
              val pred = ft match {
                case 0 => 0
                case 1 => left
                case 2 => up
                case 3 => (left + up) / 2
                case _ => paeth(left, up, ul)
              }
              raw(row)(x) = ((enc0 + pred) & 0xff).toByte
              x += 1
            }
            row += 1
          }
          // gray replicates its single channel; RGBA's alpha rides the
          // filter geometry (bpp=4) but stats stay RGB
          var sr = 0L; var sg = 0L; var sb = 0L
          row = 0
          while (row < h) {
            var c = 0
            while (c < w) {
              sr += raw(row)(bpp * c) & 0xff
              sg += raw(row)(bpp * c + (if (bpp == 1) 0 else 1)) & 0xff
              sb += raw(row)(bpp * c + (if (bpp == 1) 0 else 2)) & 0xff
              c += 1
            }
            row += 1
          }
          val n = (w * h).toDouble
          Row(id, w, h, bitDepth, colorType, nRaw,
            raw(0)(0) & 0xff,
            raw(0)(if (bpp == 1) 0 else 1) & 0xff,
            raw(0)(if (bpp == 1) 0 else 2) & 0xff,
            round6(sr / n), round6(sg / n), round6(sb / n))
        }
      }(enc)
  }

  // ------------------------------------------------------------------
  // JPEG: baseline sequential JFIF — the codec real crawled images
  // overwhelmingly arrive in. The decoder is a complete baseline
  // profile: marker walk, DQT (zigzag-ordered tables), SOF0, DHT
  // (canonical Huffman from BITS/HUFFVAL), SOS, entropy decode with
  // 0xFF00 byte-unstuffing and RSTn handling, DC DPCM + extend, AC
  // run/size with ZRL and EOB, dezigzag + dequantize, full 64-term
  // IDCT, level shift, and JFIF YCbCr→RGB. The fixture images are
  // 8×8-block constant-color mosaics whose DC quantization is EXACT
  // (Y−128 even against Q00=16; chroma−128 a multiple of Q00=17), so
  // the lossy round-trip is bit-deterministic and the DuckDB oracle
  // replays the per-block closed forms end to end — a wrong Huffman
  // table, DPCM predictor, dequant step, or color matrix scrambles the
  // means/top-left and fails the hash. Nonzero-AC payloads (the
  // general IDCT path) are cross-checked against the JDK's independent
  // ImageIO decoder in TextOpsSpec.

  val jpegStatsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_blocks", IntegerType),
    StructField("px_r", IntegerType),
    StructField("px_g", IntegerType),
    StructField("px_b", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType)))

  /** Zigzag scan: position k in the entropy stream ↔ natural index
    * ZigZag(k) in the 8×8 block (ISO/IEC 10918-1 Figure A.6). */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K example quantization tables (natural order). Only Q(0,0)
    * matters for the fixture's exactness; the full tables keep the
    * files decodable as ordinary quality-50 baseline JPEGs. */
  private val QLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
  private val QChrom: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Flat canonical Huffman tables (every code 4 bits — legal JPEG
    * BITS/HUFFVAL form, Kraft-incomplete so the all-ones code is never
    * assigned). DC: categories 0..11. AC: EOB, run-0 sizes 1..10, ZRL,
    * and (run 1, size 1) — the symbols the deterministic encoders emit;
    * anything else fails loudly at encode time. */
  private val DcHuffVals: Array[Int] = (0 to 11).toArray
  private val AcHuffVals: Array[Int] =
    Array(0x00) ++ (1 to 10).map(s => s) ++ Array(0xF0, 0x11, 0x32)

  private final class JpegBitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0; private var nbits = 0
    def write(bits: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >> i) & 1); nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = while (nbits != 0) write(1, 1) // pad with 1-bits
  }

  private def bitCategory(v: Int): Int = {
    var a = math.abs(v); var c = 0
    while (a != 0) { a >>= 1; c += 1 }
    c
  }

  /** Fixture geometry: dimensions are whole blocks so every MCU is full
    * (the decoder still computes ceil counts like a general one). */
  private[graft] def jpegDims(id: Long): (Int, Int) =
    (8 * (1 + (id % 3)).toInt, 8 * (1 + (id % 2)).toInt)

  /** Per-block fixture YCbCr (the closed forms the oracle replays):
    * Y even-offset around 128 so 8·(Y−128) divides Q00=16 exactly;
    * chroma offsets are multiples of 17 = chroma Q00 — both make DC
    * quantization lossless, so the mosaic round-trips bit-exactly. */
  private[graft] def jpegBlockYcc(id: Long, b: Int): (Int, Int, Int) = (
    (76 + 2 * ((id * 7 + b * 13) % 53)).toInt,
    (128 + 17 * (((id * 11 + b * 17) % 9) - 4)).toInt,
    (128 + 17 * (((id * 3 + b * 19) % 9) - 4)).toInt)

  /** Serialize one baseline JFIF file from quantized, zigzag-ordered
    * coefficient blocks. `sampling(c)` is component c's (square) sampling
    * factor — `[1,1,1]` is 4:4:4 and `[2,1,1]` is 4:2:0; `coefs(mcu)` is
    * that MCU's block list in interleaved scan order (per component, its
    * f² blocks raster-ordered — 3 blocks/MCU at 4:4:4, 6 at 4:2:0).
    * Components Y (tables 0) / Cb / Cr (tables 1), real DPCM per
    * component across the scan, run/size AC coding. */
  private def jpegFromCoefs(w: Int, h: Int,
                            coefs: Array[Array[Array[Int]]],
                            sampling: Array[Int] = Array(1, 1, 1),
                            restartInterval: Int = 0): Array[Byte] = {
    val nComp = sampling.length
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      out.write((body.length + 2) >> 8); out.write((body.length + 2) & 0xff)
      out.write(body)
    }
    marker(0xd8) // SOI
    seg(0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    def dqt(tq: Int, tab: Array[Int]): Array[Byte] =
      (Array(tq) ++ ZigZag.map(tab(_))).map(_.toByte)
    seg(0xdb, if (nComp == 1) dqt(0, QLum)
              else dqt(0, QLum) ++ dqt(1, QChrom))
    def sf(c: Int): Int = (sampling(c) << 4) | sampling(c)
    seg(0xc0, (Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, nComp) ++
      (0 until nComp).flatMap(c =>
        Array(c + 1, sf(c), if (c == 0) 0 else 1))).map(_.toByte))
    def dht(tcTh: Int, vals: Array[Int]): Array[Byte] = {
      val bits = Array.fill(16)(0); bits(3) = vals.length // all length 4
      (Array(tcTh) ++ bits ++ vals).map(_.toByte)
    }
    seg(0xc4, if (nComp == 1) dht(0x00, DcHuffVals) ++ dht(0x10, AcHuffVals)
              else dht(0x00, DcHuffVals) ++ dht(0x10, AcHuffVals) ++
                   dht(0x01, DcHuffVals) ++ dht(0x11, AcHuffVals))
    if (restartInterval > 0)
      seg(0xdd,
        Array(restartInterval >> 8, restartInterval & 0xff).map(_.toByte))
    seg(0xda, (Array(nComp) ++ (0 until nComp).flatMap(c =>
      Array(c + 1, if (c == 0) 0x00 else 0x11)) ++
      Array(0, 63, 0)).map(_.toByte))
    val bw = new JpegBitWriter(out)
    def huff(vals: Array[Int], sym: Int): Unit = {
      val i = vals.indexOf(sym)
      require(i >= 0, f"symbol 0x$sym%02x not in the flat Huffman table")
      bw.write(i, 4)
    }
    // block index → owning component, in interleaved scan order
    val blockComp: Array[Int] =
      sampling.zipWithIndex.flatMap { case (f, c) => Array.fill(f * f)(c) }
    val pred = Array(0, 0, 0)
    var mcuIdx = 0
    coefs.foreach { mcu =>
      if (restartInterval > 0 && mcuIdx > 0 && mcuIdx % restartInterval == 0) {
        // RSTn between entropy segments: pad to the byte, emit the
        // cycling marker, reset every component's DPCM predictor
        bw.flush()
        out.write(0xff)
        out.write(0xd0 + ((mcuIdx / restartInterval - 1) % 8))
        pred(0) = 0; pred(1) = 0; pred(2) = 0
      }
      mcuIdx += 1
      require(mcu.length == blockComp.length,
        s"expected ${blockComp.length} blocks/MCU, got ${mcu.length}")
      var bi = 0
      while (bi < mcu.length) {
        val comp = blockComp(bi)
        val zz = mcu(bi)
        val dcVals = DcHuffVals; val acVals = AcHuffVals
        val diff = zz(0) - pred(comp); pred(comp) = zz(0)
        val cat = bitCategory(diff)
        huff(dcVals, cat)
        if (cat > 0) bw.write(if (diff >= 0) diff else diff + (1 << cat) - 1, cat)
        var run = 0; var k = 1
        while (k < 64) {
          val v = zz(k)
          if (v == 0) run += 1
          else {
            while (run >= 16) { huff(acVals, 0xF0); run -= 16 }
            val size = bitCategory(v)
            huff(acVals, (run << 4) | size)
            bw.write(if (v >= 0) v else v + (1 << size) - 1, size)
            run = 0
          }
          k += 1
        }
        if (run > 0) huff(acVals, 0x00) // EOB
        bi += 1
      }
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** The quantization-exact DC-mosaic coefficient blocks (one MCU per
    * 8×8 block at 4:4:4). */
  private def jpegDcCoefs(id: Long): Array[Array[Array[Int]]] = {
    val (w, h) = jpegDims(id)
    val nb = (w / 8) * (h / 8)
    Array.tabulate(nb) { b =>
      val (y, cb, cr) = jpegBlockYcc(id, b)
      Array(
        { val a = new Array[Int](64); a(0) = 8 * (y - 128) / QLum(0); a },
        { val a = new Array[Int](64); a(0) = 8 * (cb - 128) / QChrom(0); a },
        { val a = new Array[Int](64); a(0) = 8 * (cr - 128) / QChrom(0); a })
    }
  }

  /** One deterministic baseline JPEG: the constant-block mosaic (DC
    * only in the coefficient domain — the quantization-exact fixture). */
  private[graft] def jpegBytes(id: Long): Array[Byte] = {
    val (w, h) = jpegDims(id)
    jpegFromCoefs(w, h, jpegDcCoefs(id))
  }

  /** The DC mosaic re-encoded with a restart interval of 2 MCUs — the
    * resilience feature real encoders emit routinely. DPCM resets at
    * every boundary on BOTH sides, so the decoded pixels are IDENTICAL
    * to [[jpegBytes]]'s closed forms while the scan additionally
    * exercises byte-alignment, stuffed-pad skip, marker-sequence
    * checking, and predictor reset. */
  private[graft] def jpegBytesRst(id: Long): Array[Byte] = {
    val (w, h) = jpegDims(id)
    jpegFromCoefs(w, h, jpegDcCoefs(id), restartInterval = 2)
  }

  /** Grayscale (single-component SOF/SOS) fixture — the profile scanned
    * documents and OCR corpora commonly arrive in: the luma mosaic
    * alone, no chroma planes, decode emits R=G=B=Y with no color
    * matrix. */
  private[graft] def jpegBytesGray(id: Long): Array[Byte] = {
    val (w, h) = jpegDims(id)
    val nb = (w / 8) * (h / 8)
    val coefs = Array.tabulate(nb) { b =>
      val y = jpegBlockYcc(id, b)._1
      Array({ val a = new Array[Int](64); a(0) = 8 * (y - 128) / QLum(0); a })
    }
    jpegFromCoefs(w, h, coefs, sampling = Array(1))
  }

  /** Nonzero-AC variant for the ImageIO cross-check: same mosaic DCs
    * plus closed-form AC coefficients on the luma blocks (zigzag 1..4
    * and a ZRL-forcing tail coefficient), so Huffman AC decode, extend,
    * dezigzag, and the general 64-term IDCT all run against an
    * independent reference decoder. */
  private[graft] def jpegBytesWithAc(id: Long): Array[Byte] = {
    val (w, h) = jpegDims(id)
    jpegFromCoefs(w, h, jpegAcCoefs(id))
  }

  /** AC-mosaic variant with restart markers — for the ImageIO
    * cross-check only (nonzero AC has no closed-form oracle). */
  private[graft] def jpegBytesAcRst(id: Long): Array[Byte] = {
    val (w, h) = jpegDims(id)
    jpegFromCoefs(w, h, jpegAcCoefs(id), restartInterval = 2)
  }

  private def jpegAcCoefs(id: Long): Array[Array[Array[Int]]] = {
    val (w, h) = jpegDims(id)
    val nb = (w / 8) * (h / 8)
    Array.tabulate(nb) { b =>
      val (y, cb, cr) = jpegBlockYcc(id, b)
      val ya = new Array[Int](64)
      ya(0) = 8 * (y - 128) / QLum(0)
      var k = 1
      while (k <= 4) { // never zero: keeps the emitted AC symbol set flat
        val mag = (1 + (id + b * 7 + k * 3) % 4).toInt
        ya(k) = if ((id + b + k) % 2 == 0) mag else -mag
        k += 1
      }
      ya(40) = if ((id + b) % 2 == 0) 2 else -2 // 35-zero run → ZRL×2 + 0x32
      Array(ya,
        { val a = new Array[Int](64); a(0) = 8 * (cb - 128) / QChrom(0); a },
        { val a = new Array[Int](64); a(0) = 8 * (cr - 128) / QChrom(0); a })
    }
  }

  /** Synthesize the JPEG payload column. */
  def encodeJpeg(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val enc = RowEncoder.encoderFor(payloadSchema)
    docs.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map(r => Row(r.getLong(0), jpegBytes(r.getLong(0))))
    }(enc)
  }

  /** 4:2:0 fixture geometry: whole 16×16 MCUs. */
  private[graft] def jpegDims420(id: Long): (Int, Int) =
    (16 * (1 + (id % 3)).toInt, 16 * (1 + (id % 2)).toInt)

  /** 4:2:0 fixture YCbCr: luma varies per 8×8 block ([[jpegBlockYcc]]'s Y
    * closed form over the LUMA-block raster index), chroma is constant
    * per image — constant chroma makes the 2× downsampling lossless AND
    * keeps the ImageIO cross-check exact (libjpeg's fancy chroma
    * upsampling interpolates between neighboring chroma samples, which
    * diverges from replication wherever adjacent chroma values differ). */
  private[graft] def jpegChroma420(id: Long): (Int, Int) = (
    (128 + 17 * (((id * 11) % 9) - 4)).toInt,
    (128 + 17 * (((id * 3) % 9) - 4)).toInt)

  /** One deterministic baseline 4:2:0 JPEG — the subsampling profile
    * real crawled images overwhelmingly use: interleaved 16×16 MCUs of
    * four raster-ordered luma blocks + one Cb + one Cr, luma DPCM
    * threading through all four blocks per MCU. DC quantization stays
    * exact, so the decode is bit-deterministic and oracle-checkable. */
  private[graft] def jpegBytes420(id: Long): Array[Byte] = {
    val (w, h) = jpegDims420(id)
    val bw8 = w / 8 // luma blocks per row
    val (cb, cr) = jpegChroma420(id)
    def dcOnly(dc: Int): Array[Int] = {
      val a = new Array[Int](64); a(0) = dc; a
    }
    val mcus = for {
      my <- 0 until h / 16; mx <- 0 until w / 16
    } yield {
      val ys = for (iy <- 0 to 1; ix <- 0 to 1) yield {
        val lb = (2 * my + iy) * bw8 + (2 * mx + ix)
        val y = (76 + 2 * ((id * 7 + lb * 13) % 53)).toInt
        dcOnly(8 * (y - 128) / QLum(0))
      }
      (ys :+ dcOnly(8 * (cb - 128) / QChrom(0))
        :+ dcOnly(8 * (cr - 128) / QChrom(0))).toArray
    }
    jpegFromCoefs(w, h, mcus.toArray, sampling = Array(2, 1, 1))
  }

  /** Synthesize the 4:2:0 JPEG payload column. */
  def encodeJpeg420(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val enc = RowEncoder.encoderFor(payloadSchema)
    docs.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map(r => Row(r.getLong(0), jpegBytes420(r.getLong(0))))
    }(enc)
  }

  /** Synthesize the restart-marker JPEG payload column. */
  def encodeJpegRst(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val enc = RowEncoder.encoderFor(payloadSchema)
    docs.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map(r => Row(r.getLong(0), jpegBytesRst(r.getLong(0))))
    }(enc)
  }

  /** Synthesize the grayscale JPEG payload column. */
  def encodeJpegGray(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val enc = RowEncoder.encoderFor(payloadSchema)
    docs.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map(r => Row(r.getLong(0), jpegBytesGray(r.getLong(0))))
    }(enc)
  }

  private val idctCos: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val invSqrt2 = 1.0 / math.sqrt(2.0)

  /** Full baseline decode of one JPEG payload → (w, h, R, G, B planes).
    * Throws with `what: doc <id>` on anything outside the baseline
    * 8-bit 4:4:4 / 4:2:0 profiles or on corrupt structure. */
  private[graft] def decodeJpegPixels(id: Long, bytes: Array[Byte])
      : (Int, Int, Array[Int], Array[Int], Array[Int]) = {
    require(bytes.length > 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, s"not a JPEG payload (no SOI): doc $id")
    var pos = 2
    def u8(): Int = { val v = bytes(pos) & 0xff; pos += 1; v }
    def u16(): Int = { val v = ((bytes(pos) & 0xff) << 8) |
      (bytes(pos + 1) & 0xff); pos += 2; v }
    val qtabs = Array.ofDim[Int](4, 64) // zigzag order, as stored
    // (tc,th) → flat (len,code) → symbol maps built from BITS/HUFFVAL
    val huff = scala.collection.mutable.Map.empty[(Int, Int), Map[(Int, Int), Int]]
    var w = 0; var h = 0
    var nComp = 0
    var restartInterval = 0
    val compQ = new Array[Int](3); val compDc = new Array[Int](3)
    val compAc = new Array[Int](3); val compF = new Array[Int](3)
    var sosAt = -1
    while (sosAt < 0) {
      require(pos + 4 <= bytes.length, s"truncated JPEG before SOS: doc $id")
      require((u8()) == 0xff, s"marker expected at ${pos - 1}: doc $id")
      var m = u8()
      while (m == 0xff) m = u8() // fill bytes are legal
      m match {
        case 0xdb =>
          val end = pos + u16() - 2
          while (pos < end) {
            val pqTq = u8()
            require(pqTq >> 4 == 0, s"16-bit DQT unsupported: doc $id")
            var k = 0
            while (k < 64) { qtabs(pqTq & 0xf)(k) = u8(); k += 1 }
          }
        case 0xc0 =>
          u16() // length
          require(u8() == 8, s"non-8-bit SOF0: doc $id")
          h = u16(); w = u16(); nComp = u8()
          require(nComp == 3 || nComp == 1,
            s"expected 1 or 3 components, got $nComp: doc $id")
          var c = 0
          while (c < nComp) {
            u8() // component id (1-based by convention)
            val s = u8()
            val fh = s >> 4; val fv = s & 0xf
            require(fh == fv && (fh == 1 || fh == 2),
              s"unsupported sampling ${fh}x$fv: doc $id")
            compF(c) = fh
            compQ(c) = u8(); c += 1
          }
          // supported profiles: 4:4:4 (all 1×1) and 4:2:0 (luma 2×2,
          // chroma 1×1) — every component either full or max rate
          val fmax0 = compF.take(nComp).max
          require(compF.take(nComp).forall(f => f == 1 || f == fmax0),
            s"mixed sampling ladder unsupported: doc $id")
        case 0xc4 =>
          val end = pos + u16() - 2
          while (pos < end) {
            val tcTh = u8()
            val bits = Array.fill(16)(u8())
            var code = 0
            val table = scala.collection.mutable.Map.empty[(Int, Int), Int]
            var len = 1
            while (len <= 16) {
              var i = 0
              while (i < bits(len - 1)) {
                table((len, code)) = u8(); code += 1; i += 1
              }
              code <<= 1; len += 1
            }
            huff((tcTh >> 4, tcTh & 0xf)) = table.toMap
          }
        case 0xdd =>
          require(u16() == 4, s"malformed DRI length: doc $id")
          restartInterval = u16()
        case 0xda =>
          u16()
          val ns = u8()
          require(ns == nComp, s"scan components $ns != $nComp: doc $id")
          var c = 0
          while (c < ns) {
            u8() // component selector, in SOF order here
            val t = u8(); compDc(c) = t >> 4; compAc(c) = t & 0xf; c += 1
          }
          require(u8() == 0 && u8() == 63 && u8() == 0,
            s"progressive/successive scan unsupported: doc $id")
          sosAt = pos
        case x if x >= 0xc1 && x <= 0xcf && x != 0xc4 && x != 0xc8 =>
          throw new IllegalArgumentException(
            f"non-baseline SOF marker 0xff$x%02x: doc $id")
        case 0xd9 =>
          throw new IllegalArgumentException(s"EOI before SOS: doc $id")
        case _ => // APPn/COM/... skipped
          // NOT `pos += u16() - 2`: that desugars to pos = pos + (...),
          // reading the stale pos BEFORE u16() advances it
          val skip = u16() - 2; pos += skip
      }
    }
    require(w > 0 && h > 0, s"SOS before SOF0: doc $id")
    // entropy-coded segment bit reader with FF00 unstuffing; any real
    // marker inside the scan (incl. RSTn — this profile declares no
    // restart interval) fails loudly by doc id
    var acc = 0L; var nbits = 0
    def nextBits(n: Int): Int = {
      while (nbits < n) {
        require(pos < bytes.length, s"entropy stream underflow: doc $id")
        val b = bytes(pos) & 0xff; pos += 1
        if (b == 0xff) {
          // a truncated payload ending exactly on a stuffing FF must fail
          // by doc id like every other corrupt-input path, not AIOOBE
          require(pos < bytes.length, s"entropy stream underflow: doc $id")
          val m2 = bytes(pos) & 0xff; pos += 1
          require(m2 == 0x00, // stuffed literal FF
            f"unexpected marker 0xff$m2%02x inside scan: doc $id")
        }
        acc = (acc << 8) | b; nbits += 8
      }
      val v = ((acc >> (nbits - n)) & ((1L << n) - 1)).toInt
      nbits -= n; v
    }
    def decodeSym(table: Map[(Int, Int), Int]): Int = {
      var len = 1; var code = nextBits(1)
      while (len <= 16) {
        table.get((len, code)) match {
          case Some(s) => return s
          case None => code = (code << 1) | nextBits(1); len += 1
        }
      }
      throw new IllegalArgumentException(s"invalid Huffman code: doc $id")
    }
    def extend(v: Int, size: Int): Int =
      if (size == 0) 0
      else if (v < (1 << (size - 1))) v - (1 << size) + 1
      else v
    // MCU geometry from the sampling ladder: the MCU spans 8·fmax px,
    // component c contributes f(c)² raster-ordered blocks per MCU into
    // its own plane (full-rate for luma at 4:2:0, half-rate for chroma)
    val fmax = compF.max
    val mcuPx = 8 * fmax
    val nMx = (w + mcuPx - 1) / mcuPx; val nMy = (h + mcuPx - 1) / mcuPx
    val planeW = Array.tabulate(3)(c => nMx * 8 * compF(c))
    val planes = Array.tabulate(3)(c =>
      new Array[Int](planeW(c) * nMy * 8 * compF(c)))
    val pred = Array(0, 0, 0)
    val block = new Array[Double](64)
    var mcu = 0
    while (mcu < nMx * nMy) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // Restart boundary (ISO 10918-1 §F.2.1.3.1): byte-align by
        // discarding the ≤7 leftover pad bits, consume any stuffed-pad
        // FF00 pair the 1-bit padding produced, then require the RSTn
        // marker IN SEQUENCE (n cycles 0..7) and reset every DPCM
        // predictor. An out-of-order index means dropped data.
        acc = 0L; nbits = 0
        while (pos + 1 < bytes.length && (bytes(pos) & 0xff) == 0xff &&
          (bytes(pos + 1) & 0xff) == 0x00) pos += 2
        require(pos + 1 < bytes.length && (bytes(pos) & 0xff) == 0xff,
          s"missing restart marker at MCU $mcu: doc $id")
        val rm = bytes(pos + 1) & 0xff
        val want = 0xd0 + ((mcu / restartInterval - 1) % 8)
        require(rm == want, f"restart marker 0xff$rm%02x out of order " +
          f"(want 0xff$want%02x) at MCU $mcu: doc $id")
        pos += 2
        pred(0) = 0; pred(1) = 0; pred(2) = 0
      }
      val my = mcu / nMx; val mx = mcu % nMx
      var comp = 0
      while (comp < nComp) {
        val dcTab = huff.getOrElse((0, compDc(comp)), throw
          new IllegalArgumentException(s"missing DC table ${compDc(comp)}: doc $id"))
        val acTab = huff.getOrElse((1, compAc(comp)), throw
          new IllegalArgumentException(s"missing AC table ${compAc(comp)}: doc $id"))
        val q = qtabs(compQ(comp))
        val f = compF(comp)
        var sub = 0
        while (sub < f * f) {
          val iy = sub / f; val ix = sub % f
          java.util.Arrays.fill(block, 0.0)
          val cat = decodeSym(dcTab)
          require(cat <= 11, s"DC category $cat out of range: doc $id")
          val diff = extend(nextBits(cat), cat)
          pred(comp) += diff
          block(0) = pred(comp).toDouble * q(0)
          var k = 1
          var eob = false
          while (k < 64 && !eob) {
            val rs = decodeSym(acTab)
            if (rs == 0x00) eob = true
            else if (rs == 0xF0) k += 16
            else {
              k += rs >> 4
              require(k < 64, s"AC run past block end: doc $id")
              val size = rs & 0xf
              block(ZigZag(k)) = extend(nextBits(size), size).toDouble * q(k)
              k += 1
            }
          }
          // IDCT (direct 64-term double-precision form; a production hot
          // path swaps in AAN row-column with identical rounding contract)
          val plane = planes(comp)
          val baseY = (my * f + iy) * 8; val baseX = (mx * f + ix) * 8
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              var s = 0.0
              var v = 0
              while (v < 8) {
                val cv = if (v == 0) invSqrt2 else 1.0
                var u = 0
                while (u < 8) {
                  val cu = if (u == 0) invSqrt2 else 1.0
                  val fc = block(v * 8 + u)
                  if (fc != 0.0) s += cu * cv * fc * idctCos(x)(u) * idctCos(y)(v)
                  u += 1
                }
                v += 1
              }
              val px = math.floor(s / 4.0 + 128.0 + 0.5).toInt
              plane((baseY + y) * planeW(comp) + baseX + x) =
                math.max(0, math.min(255, px))
              x += 1
            }
            y += 1
          }
          sub += 1
        }
        comp += 1
      }
      mcu += 1
    }
    // JFIF YCbCr→RGB, floor(x+0.5) rounding (the closed form the oracle
    // replays), cropped to the declared dimensions; subsampled planes
    // read by replication (y·f/fmax — exact on the constant-chroma
    // fixtures, and the standard nearest-neighbor upsample otherwise)
    val r = new Array[Int](w * h); val g = new Array[Int](w * h)
    val b = new Array[Int](w * h)
    def clamp(x: Double): Int =
      math.max(0, math.min(255, math.floor(x + 0.5).toInt))
    def sample(comp: Int, yy: Int, xx: Int): Int =
      planes(comp)(
        (yy * compF(comp) / fmax) * planeW(comp) + xx * compF(comp) / fmax)
    var yy = 0
    while (yy < h) {
      var xx = 0
      while (xx < w) {
        val o = yy * w + xx
        if (nComp == 1) { // grayscale: Y is the pixel, no color matrix
          val yv = sample(0, yy, xx)
          r(o) = yv; g(o) = yv; b(o) = yv; xx += 1
        } else {
        val yv = sample(0, yy, xx).toDouble
        val cb = sample(1, yy, xx) - 128.0
        val cr = sample(2, yy, xx) - 128.0
        r(o) = clamp(yv + 1.402 * cr)
        g(o) = clamp(yv - 0.344136 * cb - 0.714136 * cr)
        b(o) = clamp(yv + 1.772 * cb)
        xx += 1
        }
      }
      yy += 1
    }
    (w, h, r, g, b)
  }

  val jpegHashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_blocks", IntegerType),
    StructField("ahash", LongType)))

  /** Average-hash over DECODED JPEG pixels — the image-dedup
    * fingerprint on the format crawled images actually arrive in
    * (the [[aHash]] chain was BMP-only before). The aHash downsample
    * grid is the full-8×8-block lattice (mean over each block = the
    * standard decode-then-downscale), partial edge blocks cropped:
    * per-block integer luma sum (R+G+B over the block's 64 pixels),
    * bit b set iff blockSum·nBlocks > totalSum — exact integer
    * compare, no division, packed LSB-first in block raster order.
    * ≤63 blocks per image so the hash fits one BIGINT; feed the
    * output straight to [[aHashNearDups]] (format-agnostic) for the
    * banded Hamming near-dup pass. */
  def aHashJpeg(payloads: DataFrame, idCol: String = "doc_id",
                payloadCol: String = "payload"): DataFrame = {
    val enc = RowEncoder.encoderFor(jpegHashSchema)
    payloads.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.map { row =>
          val id = row.getLong(0)
          val (w, h, r, g, b) =
            decodeJpegPixels(id, row.getAs[Array[Byte]](1))
          val nbx = w / 8; val nby = h / 8
          val nb = nbx * nby
          require(nb >= 1 && nb <= 63,
            s"aHashJpeg needs 1..63 full blocks, got $nb: doc $id")
          val sums = new Array[Long](nb)
          var total = 0L
          var by = 0
          while (by < nby) {
            var bx = 0
            while (bx < nbx) {
              var s = 0L
              var y = by * 8
              while (y < by * 8 + 8) {
                var x = bx * 8
                while (x < bx * 8 + 8) {
                  val i = y * w + x
                  s += r(i) + g(i) + b(i)
                  x += 1
                }
                y += 1
              }
              sums(by * nbx + bx) = s
              total += s
              bx += 1
            }
            by += 1
          }
          var hash = 0L
          var k = 0
          while (k < nb) {
            if (sums(k) * nb > total) hash |= (1L << k)
            k += 1
          }
          Row(id, w, h, nb, hash)
        }
      }(enc)
  }

  /** REAL JPEG decode over binary payloads, partition-at-a-time — the
    * compressed-image sibling of [[decodePng]], same output contract:
    * header fields, the top-left pixel (layout sentinel) and
    * per-channel means. */
  def decodeJpeg(payloads: DataFrame, idCol: String = "doc_id",
                 payloadCol: String = "payload"): DataFrame = {
    val enc = RowEncoder.encoderFor(jpegStatsSchema)
    payloads.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.map { row =>
          val id = row.getLong(0)
          val (w, h, r, g, b) =
            decodeJpegPixels(id, row.getAs[Array[Byte]](1))
          var sr = 0L; var sg = 0L; var sb = 0L
          var i = 0
          while (i < w * h) { sr += r(i); sg += g(i); sb += b(i); i += 1 }
          val n = (w * h).toDouble
          Row(id, w, h, (w / 8) * (h / 8), r(0), g(0), b(0),
            round6(sr / n), round6(sg / n), round6(sb / n))
        }
      }(enc)
  }
}
