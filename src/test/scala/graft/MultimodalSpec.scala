package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.multimodal.Multimodal

/** §north-star multimodal: the mapPartitions decode pipeline, with the
  * REAL javax.imageio image decoder (VERDICT r13 task 6) and the
  * deterministic byte-level fallback for codec-less kinds. */
class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  /** A real 8×4 PNG: left half black, right half white. */
  private def pngBytes(): Array[Byte] = {
    val img = new BufferedImage(8, 4, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0x000000 else 0xffffff)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("mm: a real PNG decodes through the Spark pipeline with true dimensions") {
    val bytes = pngBytes()
    val blobs = Seq((1L, "image", bytes), (2L, "audio", bytes))
      .toDF("doc_id", "kind", "bytes")
    val feats = Multimodal.decodeStub(spark, blobs).collect().sortBy(_.doc_id)

    val img = feats(0)
    img.decoded shouldBe true
    (img.width, img.height) shouldBe ((8, 4))
    // black pixels → luminance 0 → bin 0; white → 255 → bin 15; half each
    img.histogram(0) shouldBe 0.5 +- 1e-12
    img.histogram(15) shouldBe 0.5 +- 1e-12
    img.histogram.sum shouldBe 1.0 +- 1e-12

    // same bytes under a non-image kind: no codec ships → byte fallback
    val aud = feats(1)
    aud.decoded shouldBe false
    (aud.width, aud.height) shouldBe ((0, 0))
    val expected = new Array[Double](16)
    bytes.foreach(b => expected((b & 0xff) >> 4) += 1.0 / bytes.length)
    aud.histogram.zip(expected).foreach { case (a, e) => a shouldBe e +- 1e-12 }
  }

  test("mm: corrupt 'image' bytes fall back deterministically, never fail the task") {
    val junk = "definitely not a PNG".getBytes("UTF-8")
    val feats = Multimodal.decodeStub(spark,
      Seq((7L, "image", junk)).toDF("doc_id", "kind", "bytes")).collect()
    feats.head.decoded shouldBe false
    feats.head.n_bytes shouldBe junk.length.toLong
    feats.head.frame_sample shouldBe junk.take(8).map(x => f"${x & 0xff}%02X").mkString
  }

  test("mm3: every synthesized PNG decodes with the dimensions the formula predicts") {
    val out = graft.queries.MultimodalQ.mm3.build(spark, sf)
      .select("doc_id", "width", "height", "decoded").collect()
    out.length should be > 0
    out.foreach { r =>
      val id = r.getLong(0)
      withClue(s"doc $id: ") {
        r.getBoolean(3) shouldBe true // the real codec ran on every row
        r.getInt(1) shouldBe 4 + (id % 13).toInt
        r.getInt(2) shouldBe 3 + (id % 7).toInt
      }
    }
    // determinism across two full runs (PNG encode→decode is lossless)
    val again = graft.queries.MultimodalQ.mm3.build(spark, sf)
      .select("doc_id", "bin7", "bin8").collect().map(r => r.getLong(0) -> (r.get(1), r.get(2))).toMap
    val first = graft.queries.MultimodalQ.mm3.build(spark, sf)
      .select("doc_id", "bin7", "bin8").collect().map(r => r.getLong(0) -> (r.get(1), r.get(2))).toMap
    again shouldBe first
  }

  test("mm4: WAV encode/decode round-trips samples exactly, including stereo") {
    // mono: a known 4-sample signal survives the container round-trip
    val mono = Array[Short](-32768, -1, 0, 32767)
    val monoWav = Multimodal.encodeWavPcm16(8000, 1, mono)
    val decodedMono = Multimodal.decodeWavPcm16(monoWav)
    decodedMono.isDefined shouldBe true
    val (rate, ch, back) = decodedMono.get
    (rate, ch) shouldBe ((8000, 1))
    back.toSeq shouldBe mono.toSeq
    // stereo: channel count comes from the header, frames = samples / channels
    val stereo = Array[Short](100, -100, 200, -200, 300, -300)
    val stereoWav = Multimodal.encodeWavPcm16(44100, 2, stereo)
    val feats = {
      val blobs = Seq((5L, stereoWav)).toDF("doc_id", "bytes")
      Multimodal.decodeAudio(spark, blobs).collect().head
    }
    feats.decoded shouldBe true
    (feats.sample_rate, feats.channels, feats.n_frames) shouldBe ((44100, 2, 3L))
    feats.peak shouldBe 300
    // corrupt bytes: zeroed row, never a task failure
    val junk = Multimodal.decodeAudio(spark,
      Seq((6L, "not a wav".getBytes("UTF-8"))).toDF("doc_id", "bytes")).collect().head
    junk.decoded shouldBe false
    junk.n_frames shouldBe 0L
  }

  test("mm5: frame container samples the middle frame; resize yields exact thumb dims") {
    val out = graft.queries.MultimodalQ.mm5.build(spark, sf)
      .select("doc_id", "n_frames", "frame_w", "frame_h", "thumb_w", "thumb_h")
      .collect()
    out.length should be > 0
    out.foreach { r =>
      val id = r.getLong(0)
      withClue(s"doc $id: ") {
        r.getInt(1) shouldBe 3 + (id % 4).toInt // container frame count survives
        (r.getInt(2), r.getInt(3)) shouldBe ((8, 6)) // real decode of the sampled frame
        (r.getInt(4), r.getInt(5)) shouldBe ((4, 3)) // real bilinear resize
      }
    }
    // malformed container → zeroed row, not a task failure
    import spark.implicits._
    import graft.multimodal.Multimodal
    Multimodal.sampleFrame("garbage".getBytes("UTF-8"), 0) shouldBe None
    // round-trip of the container itself
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](4), Array[Byte](5, 6))
    val packed = Multimodal.encodeFrameContainer(frames)
    Multimodal.sampleFrame(packed, 1).map { case (n, f) => (n, f.toSeq) } shouldBe
      Some((3, Seq[Byte](4)))
  }

  test("mm2 contract: fallback-only decode can never diverge from the byte-math oracle") {
    // mm2 now pins tryRealDecode = false, so even a blob carrying VALID
    // image magic stays on the byte-histogram path — the oracle cannot
    // drift no matter what text the driver regenerates
    val png = pngBytes()
    val feats = Multimodal.decodeStub(spark,
      Seq((1L, "image", png)).toDF("doc_id", "kind", "bytes"),
      tryRealDecode = false).collect()
    feats.head.decoded shouldBe false
    val expected = new Array[Double](16)
    png.foreach(b => expected((b & 0xff) >> 4) += 1.0 / png.length)
    feats.head.histogram.zip(expected).foreach { case (a, e) => a shouldBe e +- 1e-12 }
    // and the full corpus under mm2's exact path: all byte-math
    val blobs = Multimodal.attachBlobs(Tables.documents(spark, sf))
    Multimodal.decodeStub(spark, blobs, tryRealDecode = false)
      .filter(col("decoded")).count() shouldBe 0L
  }

  test("mm5: truncated container tail emits the zeroed row, never a task failure") {
    // header says 3 frames but the payload is cut mid-frame: the first
    // sampleFrame (frame 0) can succeed while the middle-frame read hits
    // the truncation — exactly the shape that used to .get-crash
    val frames = Seq(Array.fill[Byte](40)(1), Array.fill[Byte](40)(2),
      Array.fill[Byte](40)(3))
    val full = Multimodal.encodeFrameContainer(frames)
    val truncated = full.take(full.length - 60)
    Multimodal.sampleFrame(truncated, 0).map(_._1) shouldBe Some(3)
    Multimodal.sampleFrame(truncated, 1) shouldBe None
  }

  test("mm7: perceptual-hash near-dup finds exactly the jittered same-group pairs") {
    val out = graft.queries.MultimodalQ.mm7.build(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // ground truth: docs sharing a base pattern (same doc_id / 4 group)
    // are jittered copies of one image; everything else is unrelated
    val ids = Tables.documents(spark, sf).select(col("doc_id"))
      .collect().map(_.getLong(0))
    val expected = ids.groupBy(_ / 4).values.flatMap { g =>
      val s = g.sorted
      for (i <- s.indices; k <- i + 1 until s.length) yield (s(i), s(k))
    }.toSet
    // exact equality both ways: every jittered copy is FOUND (banding
    // recall + Hamming tolerance absorb the ±2-channel noise through the
    // real PNG → decode → bilinear-resize pipeline), and no cross-group
    // pair survives the verify (band collisions occur — ~pairs/2^16 — but
    // random patterns sit ~32 bits apart, far above the 8-bit gate);
    // all seeded, so this is deterministic, not probabilistic
    out.toSet shouldBe expected
    // the hash is stable across runs (codec + resize are deterministic)
    graft.queries.MultimodalQ.mm7.build(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe expected
  }
}
