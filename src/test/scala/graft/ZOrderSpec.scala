package graft

import org.apache.spark.sql.functions._

import graft.ext.ZOrder

/** ext/ZOrder.scala — Morton interleave: known values, bijection, the
  * locality property that makes it a data-skipping layout, and
  * Spark-side/SQL-emitter agreement. */
class ZOrderSpec extends SparkSpecBase {

  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map(i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum

  test("interleave matches hand-computed codes") {
    // x=3 (011), y=5 (101): bits land at 1+2+4+32 = 39
    mortonRef(3, 5, 3) shouldBe 39L
    val df = spark.range(1).select(
      ZOrder.interleave(lit(3L), lit(5L), 3).as("z"),
      ZOrder.interleave(lit(0L), lit(0L), 8).as("z0"),
      ZOrder.interleave(lit(255L), lit(255L), 8).as("zmax"))
    val r = df.collect()(0)
    r.getLong(0) shouldBe 39L
    r.getLong(1) shouldBe 0L
    r.getLong(2) shouldBe 65535L
  }

  test("interleave is a bijection: deinterleave recovers both coordinates") {
    forSamples(for {
      x <- org.scalacheck.Gen.choose(0L, 255L)
      y <- org.scalacheck.Gen.choose(0L, 255L)
    } yield (x, y), n = 25) { case (x, y) =>
      val z = mortonRef(x, y, 8)
      ZOrder.deinterleave(z, 0, 8) shouldBe x
      ZOrder.deinterleave(z, 1, 8) shouldBe y
    }
  }

  test("Spark column algebra and the SQL emitter agree on real data") {
    import graft.core.Tables
    val q = Tables.orders(spark, sf).select(
      (col("o_custkey") % 256).as("xq"),
      (floor(col("o_totalprice")).cast("bigint") % 256).as("yq"))
    val both = q.select(
      ZOrder.interleave(col("xq"), col("yq"), 8).as("z_col"),
      expr(s"(${ZOrder.interleaveSql("xq", "yq", 8)})").as("z_sql"))
    both.where(col("z_col") =!= col("z_sql")).count() shouldBe 0L
    both.count() should be > 0L
  }

  test("locality: contiguous z-ranges bound BOTH dimensions, x-sort does not") {
    // full 256x256 grid, split into 16 contiguous chunks of the sort order
    val pts = for (x <- 0L until 256L; y <- 0L until 256L) yield (x, y)
    def maxSpread(sorted: Seq[(Long, Long)]): (Long, Long) =
      sorted.grouped(sorted.size / 16).map { chunk =>
        (chunk.map(_._1).max - chunk.map(_._1).min,
          chunk.map(_._2).max - chunk.map(_._2).min)
      }.foldLeft((0L, 0L)) { case ((a, b), (c, d)) => (a max c, b max d) }
    val (zx, zy) = maxSpread(pts.sortBy { case (x, y) => mortonRef(x, y, 8) })
    val (_, xy) = maxSpread(pts.sortBy(identity))
    // each z-chunk of 4096 codes is a 64x64 square -> both dims bounded
    zx shouldBe 63L
    zy shouldBe 63L
    // x-major sort leaves the second dimension completely unbounded
    xy shouldBe 255L
  }
}
