package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension): image/audio/video as
  * opaque `binary` columns with typed metadata, processed in partition-sized
  * batches.
  *
  * The Spark-side shape is real — schema, partitioning, batch iteration —
  * while the actual media decode is STUBBED with a deterministic fake
  * (this container has no image/audio codecs). A production deployment
  * swaps `decodeStub` for a JNI/FFI decoder with the same signature; the
  * `mapPartitions` batch shape (one iterator per partition, reused decoder
  * instance) is exactly what a vectorized/Arrow decode path needs.
  */
object Multimodal {

  /** One decoded-media feature row. */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      format_guess: String,
      // STUB features — deterministic byte statistics standing in for real
      // decoded signal (e.g. image size / mel energy / frame count):
      byte_sum_16: Long,
      fake_width: Int,
      fake_height: Int)

  /** Attach an opaque binary column + metadata struct to a text table,
    * standing in for ingest of raw media bytes. In production the binary
    * comes from the source (parquet BINARY / object-store pointers).
    */
  def attachBinary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      col(textCol).cast("binary").as("media"),
      struct(
        octet_length(col(textCol).cast("binary")).as("n_bytes"),
        lit("utf8-text").as("format"),
        ascii(substring(col(textCol), 1, 1)).as("first_byte")).as("media_meta"))

  /** Batch "decode": per-partition iteration over binary payloads, emitting
    * typed features. The decoder body is a STUB — deterministic byte math in
    * place of a real codec — but the distribution shape (no driver collect,
    * decoder amortized per partition, output columnar-friendly) is the real
    * contract.
    */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // a real implementation would initialize the codec once here
        it.map { case (id, bytes) =>
          val n = bytes.length.toLong
          val sum16 = bytes.take(16).foldLeft(0L)((s, b) => s + (b & 0xff))
          // ??? real decode goes here; fake dims derived deterministically
          MediaFeatures(id, n, "utf8-text", sum16,
            fake_width = (sum16 % 640).toInt, fake_height = (n % 480).toInt)
        }
      }
  }

  /** Fake frame sampling for "video" payloads: every strideBytes-th slice as
    * a frame — exercises the explode/repartition shape of frame pipelines.
    */
  def frameSample(media: DataFrame, strideBytes: Int, maxFrames: Int): DataFrame =
    media.select(col("doc_id"),
        posexplode(slice(
          transform(
            sequence(lit(0),
              greatest(((octet_length(col("media")) + strideBytes - 1) / strideBytes)
                .cast("int") - 1, lit(0))),
            i => col("media").substr(i * strideBytes + 1, lit(strideBytes))),
          1, maxFrames)))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_bytes")
}
