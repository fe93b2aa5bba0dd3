package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata (builder brief).
  *
  * The Spark-side plumbing — schema, batching, partition sizing — is real
  * and tested; the actual media decode is STUBBED with a deterministic
  * fake (this container has no image/audio codecs). A production deploy
  * replaces [[decodeStub]]'s body with the codec call; everything around
  * it (the `mapPartitions` batch shape, the output schema, the
  * repartition-by-size strategy) is what matters at 100 TB: payloads are
  * processed partition-at-a-time with zero driver involvement, and the
  * feature schema is columnar so downstream training readers prune it.
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

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("mean_byte", DoubleType),
    StructField("feature", ArrayType(FloatType))))

  /** ??? REAL DECODER GOES HERE ??? — deterministic stand-in for an
    * image/audio decode + feature extraction. Consumes (doc_id, payload)
    * rows partition-at-a-time — the exact batch shape a Pandas-UDF/JNI
    * decoder would use — and emits a fixed-width float feature vector
    * derived from the bytes. Replace the body, keep the signature. */
  def decodeStub(spark: SparkSession, payloads: DataFrame,
                 featureDim: Int = 8): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    val input = payloads.select(col("doc_id").cast("long"), col("payload"))
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val mean = if (bytes.isEmpty) 0.0
          else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
        // fake "feature": strided byte means — stands in for pixels/PCM
        val feat = (0 until featureDim).map { k =>
          val slice = bytes.indices.filter(_ % featureDim == k).map(i => (bytes(i) & 0xff).toFloat)
          if (slice.isEmpty) 0f else slice.sum / slice.length
        }.toArray
        Row(id, bytes.length, mean, feat)
      }
    }(enc)
  }
}
