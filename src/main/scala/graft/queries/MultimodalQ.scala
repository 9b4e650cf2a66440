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
    // fallback-only decode: this query's oracle IS the byte math, so a
    // regenerated corpus doc whose text bytes happen to parse as an image
    // must not flip to pixel features (driver testdata drifts rounds)
    Multimodal.decodeStub(spark, blobs, tryRealDecode = false).toDF()
      .select(col("doc_id"), col("kind"), col("n_bytes"), col("frame_sample"),
        score6(element_at(col("histogram"), 7)).as("bin6"),
        score6(element_at(col("histogram"), 8)).as("bin7"))
      .orderBy(col("doc_id"))
  }

  /** The REAL codec in the registered query surface: per document, a
    * deterministic PNG is synthesized IN-EXECUTOR (dimensions + xorshift
    * pixels keyed by doc_id), encoded with javax.imageio, then decoded
    * back through the same mapPartitions pipeline every real media blob
    * takes — recovered dimensions and the pixel-luminance histogram prove
    * a genuine codec ran, not byte math. X-tier (DuckDB cannot decode
    * PNGs); MultimodalSpec asserts the recovered dimensions against the
    * synthesis formula and `decoded = true` on every row. PNG is
    * lossless and the pixel stream is seeded, so output is deterministic
    * across runs and JVMs. Scale posture: synthesis/encode/decode all run
    * inside one mapPartitions pass — no blob ever shuffles; only the
    * (doc_id, dims, bins) feature rows move. */
  val mm3: QueryDef = x("mm3_real_image_decode") { (spark, dir) =>
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
    val blobs = docs.mapPartitions { ids =>
      javax.imageio.ImageIO.setUseCache(false)
      ids.map { id =>
        val w = 4 + (id % 13).toInt
        val h = 3 + (id % 7).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var s = id * 0x9E3779B97F4A7C15L + 1L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            s ^= s << 13; s ^= s >>> 7; s ^= s << 17
            img.setRGB(x, y, (s & 0xffffffL).toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (id, "image", bos.toByteArray)
      }
    }.toDF("doc_id", "kind", "bytes")
    Multimodal.decodeStub(spark, blobs).toDF()
      .select(col("doc_id"), col("width"), col("height"), col("decoded"),
        // middle luminance bins: random RGB concentrates there, so these
        // carry real signal (the extreme bins are ~always 0 on noise)
        score6(element_at(col("histogram"), 8)).as("bin7"),
        score6(element_at(col("histogram"), 9)).as("bin8"))
      .orderBy(col("doc_id"))
  }

  /** REAL audio codec, fully ORACLE-CHECKED: per document a deterministic
    * 16-bit PCM sawtooth (pure INTEGER arithmetic — no libm in the
    * waveform, so DuckDB regenerates the exact samples with
    * generate_series) is encoded as a WAV container and decoded back
    * through javax.sound.sampled in the same mapPartitions pass. The
    * header facts (sample_rate, channels, n_frames) and integer-exact
    * sample stats (sum-of-squares RMS, peak) come from the DECODED
    * stream, so a hash match against the oracle proves the codec
    * round-trip is faithful sample-for-sample. Blobs never shuffle. */
  val mm4: QueryDef = m(
    "mm4_audio_wav_decode",
    """WITH d AS (SELECT doc_id, 400 + doc_id % 200 AS n, 3 + doc_id % 11 AS k
      |           FROM documents),
      |s AS (SELECT d.doc_id, d.n,
      |        ((g.f * d.k * 257) % 65536) - 32768 AS v
      |      FROM d, generate_series(0, 399 + 200) AS g(f)
      |      WHERE g.f < d.n)
      |SELECT doc_id, 8000 AS sample_rate, 1 AS channels,
      |  CAST(n AS BIGINT) AS n_frames,
      |  ROUND(sqrt(CAST(SUM(CAST(v AS BIGINT) * v) AS DOUBLE) / COUNT(*)), 6) AS rms,
      |  CAST(MAX(ABS(v)) AS INTEGER) AS peak
      |FROM s GROUP BY doc_id, n ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val blobs = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val n = 400 + (id % 200).toInt
          val k = 3 + (id % 11).toInt
          val samples = new Array[Short](n)
          var f = 0
          while (f < n) {
            samples(f) = (((f * k * 257) % 65536) - 32768).toShort
            f += 1
          }
          (id, Multimodal.encodeWavPcm16(8000, 1, samples))
        }
      }.toDF("doc_id", "bytes")
    Multimodal.decodeAudio(spark, blobs).toDF()
      .where(col("decoded"))
      .select(col("doc_id"), col("sample_rate"), col("channels"),
        col("n_frames"), col("rms"), col("peak"))
      .orderBy(col("doc_id"))
  }

  /** Frame-sample + REAL decode + REAL resize — the remaining two ops of
    * the north-star media quartet (decode/extract/resize/frame-sample).
    * Per document: a frame "video" is synthesized (deterministic PNGs in
    * a length-prefixed container — the demux stand-in is labeled in
    * Multimodal.encodeFrameContainer; the per-frame codec is real), the
    * MIDDLE frame is sampled without touching the others, decoded via
    * javax.imageio, and bilinear-resized to a 4×3 thumbnail whose
    * luminance histogram is the output feature. X-tier (PNG/raster bytes
    * aren't SQL-reproducible); MultimodalSpec asserts frame counts,
    * dimensions, and in-JVM determinism. Blobs stay inside one
    * mapPartitions pass end-to-end — only (id, counts, dims, bins)
    * shuffle. */
  val mm5: QueryDef = x("mm5_video_frame_sample") { (spark, dir) =>
    import spark.implicits._
    val blobs = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.map { id =>
          val nFrames = 3 + (id % 4).toInt
          val frames = (0 until nFrames).map { f =>
            val img = new java.awt.image.BufferedImage(
              8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var s = id * 0x9E3779B97F4A7C15L + f * 0xC2B2AE3D27D4EB4FL + 1L
            for (y <- 0 until 6; x <- 0 until 8) {
              s ^= s << 13; s ^= s >>> 7; s ^= s << 17
              img.setRGB(x, y, (s & 0xffffffL).toInt)
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            bos.toByteArray
          }
          (id, Multimodal.encodeFrameContainer(frames))
        }
      }.toDF("doc_id", "bytes")
    blobs.as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          // every stage guarded: a truncated tail whose header parses but
          // whose middle frame doesn't (or whose frame bytes aren't a
          // decodable image) emits the zeroed row like any other malformed
          // blob — "malformed never fails the task" holds end-to-end, not
          // just at the header
          val decoded = for {
            (n, _) <- Multimodal.sampleFrame(bytes, 0)
            (_, mid) <- Multimodal.sampleFrame(bytes, n / 2)
            img <- Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(mid)))
          } yield {
            val thumb = Multimodal.resizeImage(img, 4, 3)
            var bin7 = 0
            var total = 0
            for (y <- 0 until 3; x <- 0 until 4) {
              val rgb = thumb.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
              if ((lum >> 4) == 7) bin7 += 1
              total += 1
            }
            (id, n, img.getWidth, img.getHeight, thumb.getWidth, thumb.getHeight,
              BigDecimal(bin7.toDouble / total)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
          decoded.getOrElse((id, 0, 0, 0, 0, 0, 0.0))
        }
      }
      .toDF("doc_id", "n_frames", "frame_w", "frame_h", "thumb_w", "thumb_h", "bin7")
      .orderBy(col("doc_id"))
  }

  /** Whole-blob ingest through Spark's `binaryFile` datasource — the
    * front door a real multimodal corpus arrives through (a bucket of
    * image/audio/video files, NOT rows in a table). The query first
    * materializes a small blob store executor-side (each task writes its
    * partition's documents as `doc_<id>.bin` through the Hadoop
    * FileSystem API — no driver collect), then ingests it back via the
    * config surface (`format: binaryfile` + pathGlobFilter): one row per
    * blob with the connector's fixed schema. The oracle re-derives byte
    * length and md5 from the same documents in DuckDB, so path→row
    * fidelity is hash-checked end to end.
    *
    * Scale posture: binaryFile parallelizes by FILE — the driver lists
    * the store (O(files) metadata, same as any object-store listing) and
    * executors stream blob bytes straight into rows; blobs never pass
    * through the driver. Row width is the blob itself, so downstream ops
    * should extract features (mm2-mm5) and DROP the bytes before any
    * shuffle; the 2 GB column cap means >2 GB media is sharded at the
    * edge. */
  val mm6: QueryDef = m(
    "mm6_binaryfile_source",
    """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS content_md5
      |FROM documents WHERE doc_id % 100 = 0
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val store = "/tmp/graft_io/blob_store"
    val storePath = new org.apache.hadoop.fs.Path(store)
    val fs = storePath.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(storePath, true)
    fs.mkdirs(storePath)
    Tables.documents(spark, dir).where(col("doc_id") % 100 === 0)
      .select(col("doc_id"), col("text"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        // executor-side: re-resolve the FS from a fresh Configuration
        // (the driver's conf is not serializable capture-free; for the
        // local/HDFS case defaults carry the same fs.defaultFS)
        val pfs = new org.apache.hadoop.fs.Path(store)
          .getFileSystem(new org.apache.hadoop.conf.Configuration())
        it.foreach { r =>
          val out = pfs.create(new org.apache.hadoop.fs.Path(
            store, s"doc_${r.getLong(0)}.bin"), true)
          try out.write(r.getString(1)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
        }
      }
    val spec = graft.config.PipelineSpec.parse(
      s"""name: mm6_binaryfile
         |source:
         |  format: binaryfile
         |  path: "$store"
         |  options: {pathGlobFilter: "*.bin"}
         |""".stripMargin)
    graft.pipeline.PipelineRunner.read(spark, spec.source)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1)
          .cast("long").as("doc_id"),
        col("length").as("n_bytes"),
        md5(col("content")).as("content_md5"))
      .orderBy(col("doc_id"))
  }

  /** IMAGE NEAR-DUP DETECTION via perceptual average-hash — the visual
    * analogue of k8's SimHash, closing the multimodal dedup story (a real
    * image corpus dedups on pixels, not bytes: re-encoded/jittered copies
    * have different bytes but the same picture). Per document a PNG is
    * synthesized where GROUPS of 4 docs share a base pattern and each doc
    * adds small per-pixel jitter (the stand-in for re-encode noise), then
    * every blob runs the REAL pipeline: javax.imageio decode → 8×8
    * bilinear thumbnail → luminance mean-threshold → 64-bit aHash.
    *
    * Matching is the LSH discipline, never all-pairs: the hash splits
    * into 4×16-bit bands, candidates equi-join on (band, value) — a
    * jittered copy agrees on ≥1 band with near-certainty — and only
    * candidates pay the exact Hamming check (bit_count(a XOR b) ≤ 8).
    * Cross-group band collisions (expected at ~2^-16 × pairs) are killed
    * by the verify step, same as k6/k12b. X-tier (raster bytes aren't
    * SQL-reproducible); MultimodalSpec asserts the found pairs are
    * EXACTLY the same-group pairs. Hashing is map-only in one
    * mapPartitions pass (codec amortized per task); only (id, hash) rows
    * ever shuffle — at 100 TB of images the exchange carries 16 bytes a
    * blob. */
  val mm7: QueryDef = x("mm7_image_phash_neardup") { (spark, dir) =>
    import spark.implicits._
    val hashes = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.map { id =>
          val group = id / 4
          val w = 16 + (group % 9).toInt
          val h = 12 + (group % 5).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var s = group * 0x9E3779B97F4A7C15L + 1L // base: per-GROUP
          var j = id * 0xC2B2AE3D27D4EB4FL + 1L    // jitter: per-DOC
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              s ^= s << 13; s ^= s >>> 7; s ^= s << 17
              j ^= j << 13; j ^= j >>> 7; j ^= j << 17
              def jit(v: Long, k: Int): Int = {
                val d = ((j >>> k) % 5).toInt - 2 // ±2 per channel
                math.min(255, math.max(0, ((v & 0xff) + d).toInt))
              }
              img.setRGB(x, y, (jit(s >>> 16, 8) << 16) |
                (jit(s >>> 8, 24) << 8) | jit(s, 40))
              x += 1
            }
            y += 1
          }
          // real codec round trip, then the aHash over the 8×8 thumbnail
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val back = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bos.toByteArray))
          val thumb = Multimodal.resizeImage(back, 8, 8)
          val lum = new Array[Int](64)
          var sum = 0L
          for (ty <- 0 until 8; tx <- 0 until 8) {
            val rgb = thumb.getRGB(tx, ty)
            val l = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            lum(ty * 8 + tx) = l
            sum += l
          }
          val mean = sum.toDouble / 64
          var hash = 0L
          var i = 0
          while (i < 64) {
            if (lum(i) > mean) hash |= (1L << i)
            i += 1
          }
          (id, hash)
        }
      }.toDF("doc_id", "phash")
    val banded = hashes.select(col("doc_id"), col("phash"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("phash"), b * 16) % 65536): _*)))
      .toDF("doc_id", "phash", "band", "bval")
    val a = banded.toDF("id_a", "hash_a", "band_a", "bval_a")
    val b = banded.toDF("id_b", "hash_b", "band_b", "bval_b")
    a.join(b, col("band_a") === col("band_b") && col("bval_a") === col("bval_b")
        && col("id_a") < col("id_b"))
      // a pair can agree on several bands — collapse before the verify
      .select(col("id_a"), col("id_b"), col("hash_a"), col("hash_b"))
      .distinct()
      .withColumn("hamming",
        expr("bit_count(hash_a ^ hash_b)").cast("long"))
      .where(col("hamming") <= 8)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy(col("id_a"), col("id_b"))
  }

  override def defs: Seq[QueryDef] = Seq(mm1, mm2, mm3, mm4, mm5, mm6, mm7)
}
