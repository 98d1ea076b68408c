package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract
  * steps as partition-local batch functions.
  *
  * The actual codecs are NOT available in this environment, so the decode
  * is a clearly-marked deterministic fake ([[fakeDecode]]); everything
  * around it — schema, binary column handling, partitioning, the
  * `mapPartitions` batch shape — is real and tested. Swapping in a real
  * decoder is a one-function change.
  *
  * Scale notes: payloads ride through the plan as `BinaryType` (never
  * stringified); per-partition processing batches rows so a real decoder
  * could amortize codec init; metadata-only queries never touch the
  * payload bytes thanks to parquet column pruning.
  */
object Multimodal {

  /** A decoded-media feature row (what a real image decoder would emit). */
  final case class MediaFeatures(
      doc_id: Long,
      byte_len: Long,
      format: String,
      width: Int,
      height: Int,
      checksum: String,
      thumb_len: Long,
      thumb_checksum: String)

  /** Synthesize a binary "media" column from the documents table — the
    * harness ships no binary payloads, so the text bytes stand in as the
    * opaque blob. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        col("source"), col("n_chars"))

  /** Metadata extraction as pure column ops over the binary payload:
    * length, content hash, fake container sniff + dimensions derived
    * deterministically from metadata (NOT a real decode — see header). */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"),
        octet_length(col("payload")).cast("long").as("byte_len"),
        sha2(col("payload"), 256).as("checksum"),
        upper(hex(substring(col("payload"), 1, 4))).as("magic"),
        (col("n_chars") % 640 + 1).cast("int").as("width"),
        (col("n_chars") % 480 + 1).cast("int").as("height"))
      .orderBy(col("doc_id"))

  /** STUB decode: a real implementation would hand `payload` to an image
    * codec here. This deterministic fake derives "dimensions" from the
    * byte length so downstream plumbing is exercised honestly. */
  def fakeDecode(docId: Long, payload: Array[Byte]): MediaFeatures = {
    def sha(bytes: Array[Byte]): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(bytes).map("%02x".format(_)).mkString
    val len = payload.length.toLong
    // "resize": deterministic 8x byte downsample standing in for a real
    // thumbnail pass — keeps every 8th byte (group heads)
    val thumb = payload.grouped(8).map(_.head).toArray
    MediaFeatures(
      doc_id = docId,
      byte_len = len,
      format = if (len % 2 == 0) "png" else "jpg",
      width = (len % 640).toInt + 1,
      height = (len % 480).toInt + 1,
      checksum = sha(payload),
      thumb_len = thumb.length.toLong,
      thumb_checksum = sha(thumb))
  }

  /** The batch decode operator: partition-local iteration over binary
    * payloads (the Scala analogue of a pandas `mapInPandas` decode UDF).
    * Rows are processed per partition so a real codec would be
    * initialized once per partition, not per row. */
  def decodeFeatures(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real impl: val codec = Codec.acquire() once per partition
        rows.map { case (id, bytes) => fakeDecode(id, bytes) }
      }
  }

  /** Frame sampling shape: every k-th fixed-size byte window of the
    * payload becomes a "frame" row — the video-frame-extraction dataflow
    * (explode on a computed offset sequence; payload stays binary). */
  def frameSample(spark: SparkSession, dir: String, frameBytes: Int = 64,
      stride: Int = 128): DataFrame =
    mediaTable(spark, dir)
      .withColumn("n_frames",
        greatest(lit(1), (octet_length(col("payload")) / stride).cast("int")))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("n_frames") - 1),
          i => col("payload").substr(i * stride + 1, lit(frameBytes))))
          .as(Seq("frame_idx", "frame_bytes")))
}
