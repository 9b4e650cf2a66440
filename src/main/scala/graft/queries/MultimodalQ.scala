package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.core.Det._
import graft.multimodal.Multimodal

/** North-star multimodal rows: opaque BINARY media columns with typed
  * metadata; SQL-expressible byte ops are oracle-checked (mm1), and the
  * mapPartitions decode/extract pipeline ships as a rows-checked query
  * (mm2) + MultimodalSpec unit tests (decode is a deterministic stub —
  * no media codecs in this container; the Spark plumbing is real). */
object MultimodalQ extends QueryPack {
  import QueryDef._

  /** Blob + metadata handling entirely in SQL-visible byte ops: sizes,
    * content hash, leading-frame hex sample. */
  val mm1: QueryDef = m(
    "mm1_blob_metadata",
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image/jpeg'
      |       WHEN doc_id % 3 = 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
      |  octet_length(encode(text)) AS n_bytes,
      |  md5(text) AS content_md5,
      |  hex(encode(substring(text, 1, 8))) AS frame_sample,
      |  's3://media-bucket/doc/' || doc_id AS uri
      |FROM documents ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val blobs = Multimodal.attachBlobs(Tables.documents(spark, dir))
    blobs.select(
      col("doc_id"), col("kind"), col("meta.mime").as("mime"),
      octet_length(col("bytes")).cast("long").as("n_bytes"),
      md5(col("bytes")).as("content_md5"),
      hex(substring(col("bytes"), 1, 8)).as("frame_sample"),
      col("meta.uri").as("uri"))
      .orderBy(col("doc_id"))
  }

  /** The mapPartitions decode+extract pipeline: features only (the blob
    * never shuffles). Histogram values surface at 6 dp (D-rule 7); the
    * whole row set is oracle-checked because the stub is deterministic
    * byte math that DuckDB can replicate over the utf-8 blob (the corpus
    * is pure ASCII — measured octet_length == length for every doc — so
    * per-char ascii()>>4 equals the byte histogram bin). */
  val mm2: QueryDef = m(
    "mm2_feature_extract",
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |  octet_length(encode(text)) AS n_bytes,
      |  hex(encode(substring(text, 1, 8))) AS frame_sample,
      |  ROUND(CAST(len(list_filter(string_split(text, ''), c -> ascii(c) // 16 = 6)) AS DOUBLE)
      |    / length(text), 6) AS bin6,
      |  ROUND(CAST(len(list_filter(string_split(text, ''), c -> ascii(c) // 16 = 7)) AS DOUBLE)
      |    / length(text), 6) AS bin7
      |FROM documents ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val blobs = Multimodal.attachBlobs(Tables.documents(spark, dir))
    Multimodal.decodeStub(spark, blobs).toDF()
      .select(col("doc_id"), col("kind"), col("n_bytes"), col("frame_sample"),
        score6(element_at(col("histogram"), 7)).as("bin6"),
        score6(element_at(col("histogram"), 8)).as("bin7"))
      .orderBy(col("doc_id"))
  }

  override def defs: Seq[QueryDef] = Seq(mm1, mm2)
}
