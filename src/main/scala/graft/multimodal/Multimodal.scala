package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for the 100 TB training-data pipeline: media is an
  * opaque BINARY column plus a typed metadata struct, processed with
  * batch-shaped per-partition operators.
  *
  * Design (north-star requirement): at cluster scale, image/audio/video
  * bytes travel as parquet BINARY (or out-of-line object-store pointers in
  * `uri`); decode / feature-extract / resize / frame-sample run inside
  * `mapPartitions` so each task amortizes codec setup over its whole
  * partition and the shuffle only ever moves the (small) extracted
  * features, never re-shuffles raw bytes. No media codecs ship in this
  * container, so [[decodeStub]] is the clearly-marked FAKE decode — a
  * deterministic byte-level stand-in with the same signature, batching
  * shape, and schema a real libjpeg/ffmpeg binding would have. Swap the
  * function body, keep the plumbing.
  */
object Multimodal {

  /** Typed metadata carried beside the blob (schema is the contract). */
  final case class MediaMeta(
      mime: String, width: Int, height: Int, nBytes: Long, uri: String)

  final case class MediaRow(doc_id: Long, kind: String,
      bytes: Array[Byte], meta: MediaMeta)

  /** Feature record produced by decode+extract — this (not the blob) is
    * what downstream joins/dedup/search shuffle. */
  final case class MediaFeatures(
      doc_id: Long, kind: String, n_bytes: Long,
      frame_sample: String,           // hex of the sampled leading frame
      histogram: Array[Double])       // 16-bin normalized byte histogram

  /** Deterministic blob synthesis: documents.text encoded as UTF-8 plays
    * the role of downloaded media bytes; meta is derived, `uri` points at
    * the object-store location a real pipeline would fetch lazily. */
  def attachBlobs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        when(col("doc_id") % 3 === 0, "image/jpeg")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("mime"),
        lit(0).as("width"), lit(0).as("height"),
        length(col("text")).cast("long").as("nBytes"),
        concat(lit("s3://media-bucket/doc/"), col("doc_id")).as("uri")).as("meta"))

  /** FAKE decode + feature extraction (???-equivalent): a real build links
    * a codec here. Byte histogram stands in for pixel/sample statistics;
    * `frame_sample` is the first-8-byte "frame". Deterministic, so it is
    * testable end-to-end. Runs per-partition: one "codec init" per task,
    * then a streamed pass over the partition's rows. */
  def decodeStub(spark: SparkSession, blobs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    blobs.select(col("doc_id"), col("kind"), col("bytes")).as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // <- real impl: codecInit() once per partition
        rows.map { case (id, kind, bytes) =>
          val hist = new Array[Double](16)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1; i += 1 }
          val n = math.max(bytes.length, 1)
          var b = 0
          while (b < 16) { hist(b) /= n; b += 1 }
          val frame = bytes.take(8).map(x => f"${x & 0xff}%02X").mkString
          MediaFeatures(id, kind, bytes.length.toLong, frame, hist)
        }
      }
  }
}
