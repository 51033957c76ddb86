package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video ride through the
  * engine as opaque `binary` columns with a typed metadata struct.
  * The Spark-side contract — schema, partition-local batch
  * processing, deterministic outputs — is real and tested; the media
  * decode itself is STUBBED (this container has no image/audio
  * codecs): [[decodeStub]] derives fake-but-deterministic dimensions
  * from the payload bytes, and marks itself clearly. Swap the stub
  * body for a real codec (e.g. JNI or an FFI batch call) without
  * touching the pipeline shape.
  */
object Multimodal {

  /** Metadata struct computed scan-side from the payload: byte size,
    * SHA-256 content address. Codegen'd; no UDF. */
  def withMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("meta", struct(
      length(col(binCol)).cast("long").as("n_bytes"),
      sha2(col(binCol), 256).as("sha256")))

  /** STUB image decode: deterministic fake dimensions derived from
    * payload length (`1 + n % 64`); replace with a real decoder. The
    * column types and null behavior match what a real decoder would
    * produce. */
  def decodeStub(df: DataFrame, binCol: String): DataFrame = {
    val n = length(col(binCol)).cast("long")
    df.withColumn("decoded", struct(
      (lit(1L) + pmod(n, lit(64L))).as("width"),
      (lit(1L) + pmod(n * 7L, lit(64L))).as("height"),
      lit(3L).as("channels")))
  }

  /** Partition-local batch API for heavyweight decoders: the
    * reference shape for anything that must amortize per-batch setup
    * (model weights, codec contexts) — the Scala analog of
    * mapInPandas. Rows stream through one partition at a time;
    * `decode` sees the raw bytes and returns fixed-schema features.
    */
  def mapBatches(df: DataFrame, binCol: String,
                 featureSchema: StructType)(
                 decode: Iterator[Array[Byte]] => Iterator[Row]): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", featureSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // duplicate + lockstep zip keeps memory bounded by the decoder's
      // internal batch (the duplicate gap), NOT the partition size —
      // a fully-buffered partition of binary payloads is exactly what
      // blows an executor at corpus scale
      val (forFeatures, forRows) = rows.duplicate
      val feats = decode(forFeatures.map(_.getAs[Array[Byte]](binIdx)))
      forRows.zip(feats).map { case (r, f) =>
        Row.fromSeq(r.toSeq :+ f)
      }
    }(encoder)
  }

  /** STUB resize: deterministic truncation of the payload to
    * `targetBytes` — stands in for a real image resize while keeping
    * the binary-in/binary-out column contract (narrow, codegen'd;
    * a real resize plugs into [[mapBatches]] instead when it needs
    * per-batch codec state). */
  def resizeStub(df: DataFrame, binCol: String, targetBytes: Int = 256): DataFrame =
    df.withColumn("resized", col(binCol).substr(lit(1), lit(targetBytes)))

  /** STUB feature extractor: a deterministic pseudo-embedding
    * (md5-derived floats in [-1, 1)) with the exact schema a real
    * vision/audio encoder would emit (`array<float>`), so the
    * downstream Similarity/Dedup operators run unchanged. Chain:
    * payloads -> [[resizeStub]] -> embedStub -> `Similarity.*TopK`.
    */
  def embedStub(df: DataFrame, binCol: String, dim: Int = 8): DataFrame =
    df.withColumn("embedding",
      transform(sequence(lit(0), lit(dim - 1)),
        j => {
          val x = conv(substring(md5(concat(j.cast("string"), base64(col(binCol)))), 1, 12),
            16, 10).cast("double") / lit((1L << 48).toDouble) * 2.0 - 1.0
          // clamp below 1 (the double->float cast would round values in
          // (1 - 2^-25, 1) up to exactly 1.0f); when/otherwise rather
          // than least() so a NULL payload keeps a NULL element instead
          // of collapsing onto a shared constant vector
          when(x > lit(0.99999994), lit(0.99999994)).otherwise(x).cast("float")
        }))

  /** STUB frame sampler for video-ish payloads: every `stride`-th
    * byte as a "frame id" — stands in for frame extraction while
    * exercising array-of-binary schema. */
  def sampleFramesStub(df: DataFrame, binCol: String, stride: Int = 16): DataFrame =
    df.withColumn("frames",
      transform(sequence(lit(0), floor((length(col(binCol)).cast("int") - 1) / stride).cast("int")),
        i => col(binCol).substr(i * stride + 1, lit(stride))))
}
