package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque binary
  * columns with typed metadata structs.
  *
  * The decode kernels (actual JPEG/audio decoding) are STUBBED with a
  * deterministic fake — the container ships no media libs — but the
  * Spark-side contract is real: schemas, partition-sized batch shapes,
  * and the transform pipeline are what a production decode-UDF plugs
  * into.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** 48-bit positive hash of a binary payload: the leading 12 hex
    * nibbles of md5, as a long. Engine-portable (any engine with md5 +
    * substring reproduces it), which is what lets the stubbed fakes
    * below be oracle-checked. */
  private def md5Bits48(c: Column, salt: String = ""): Column = {
    val salted = if (salt.isEmpty) c else concat(c, lit(salt).cast("binary"))
    conv(substring(md5(salted), 1, 12), 16, 10).cast("long")
  }

  /** Wrap a binary payload column with extracted metadata. The fake
    * "header parse" derives deterministic dimensions from a portable
    * payload hash — replace with a real header sniffer in production. */
  def withMediaMeta(df: DataFrame, binCol: String): DataFrame = {
    val h = md5Bits48(col(binCol))
    df.withColumn("media_meta", struct(
      lit("image/fake").as("media_type"),
      (pmod(h, lit(1920)) + 1).cast("int").as("width"),
      (pmod(shiftright(h, 16), lit(1080)) + 1).cast("int").as("height"),
      length(col(binCol)).cast("long").as("n_bytes")))
  }

  /** STUB decode → fixed-size feature vector. Deterministic fake:
    * seeded pseudo-features from the portable payload hash. A real
    * implementation would decode + pool pixels per partition batch;
    * the signature (binary → Array[Float]) and the per-partition
    * batching pattern are the production contract. */
  def decodeToFeatures(df: DataFrame, binCol: String, dim: Int = 8): DataFrame = {
    val feats = array((0 until dim).map { i =>
      (pmod(md5Bits48(col(binCol), s" $i"), lit(1000)).cast("double") / 1000.0).cast("float")
    }: _*)
    df.withColumn("features", feats)
  }

  /** STUB resize: a real implementation decodes, resamples pixels to
    * (w,h) and re-encodes per partition batch; the stub keeps the
    * contract — binary in, binary out, target dims recorded in the
    * metadata struct — by byte-range scaling the payload to the
    * target "pixel count" deterministically. */
  def resizeMedia(df: DataFrame, binCol: String, width: Int, height: Int): DataFrame =
    df.withColumn("resized",
        expr(s"substring($binCol, 1, int(greatest(least(length($binCol), ${width * height}), 1)))"))
      .withColumn("resized_meta", struct(
        lit("image/fake").as("media_type"),
        lit(width).as("width"), lit(height).as("height"),
        length(col("resized")).cast("long").as("n_bytes")))

  /** Frame sampling plumbing for "video" payloads: split the payload
    * into n equal byte-range "frames" (stub for keyframe extraction),
    * exploded one row per frame — the partition-parallel shape a real
    * extractor uses. */
  def sampleFrames(df: DataFrame, binCol: String, n: Int): DataFrame = {
    val total = length(col(binCol))
    val frames = transform(sequence(lit(0), lit(n - 1)), i =>
      struct(i.as("frame_idx"),
        substring(col(binCol), (i * (total / n) + 1).cast("int"), (total / n).cast("int"))
          .as("frame_bytes")))
    df.withColumn("frame", explode(frames))
      .withColumn("frame_idx", col("frame.frame_idx"))
      .withColumn("frame_bytes", col("frame.frame_bytes"))
      .drop("frame")
  }
}
