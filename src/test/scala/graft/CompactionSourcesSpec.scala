package graft

import org.apache.spark.sql.functions._

import graft.config._
import graft.core.Tables
import graft.pipeline.PipelineRunner

/** Round-15 config-surface extensions: sink compaction (`files`), ORC
  * source/sink parity, and the `binaryfile` whole-blob ingest source. */
class CompactionSourcesSpec extends SparkSpecBase {

  private val io = "/tmp/graft_io/spec_r15"

  private def partFiles(dir: String): Seq[java.io.File] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).toSeq.flatten.filter(_.getName.startsWith("part-"))
  }

  test("compaction: `files: n` commits exactly n files, content unchanged") {
    Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .repartition(16) // simulate small-file sprawl
      .write.mode("overwrite").parquet(s"$io/nation_frag")
    partFiles(s"$io/nation_frag").size should be > 3
    PipelineRunner.run(spark,
      s"""name: compact_spec
         |source: {format: parquet, path: "$io/nation_frag"}
         |sink: {format: parquet, path: "$io/nation_compact", files: 2}
         |""".stripMargin)
    val files = partFiles(s"$io/nation_compact")
    files.size should be <= 2
    files.size should be >= 1
    val got = spark.read.parquet(s"$io/nation_compact")
      .orderBy(col("n_nationkey")).collect()
    val want = Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .orderBy(col("n_nationkey")).collect()
    got shouldBe want
  }

  test("compaction: files must be positive and layout-compatible") {
    def sinkYaml(extra: String) =
      s"""name: bad
         |source: {format: parquet, path: "x"}
         |sink: {format: parquet, path: "y", $extra}
         |""".stripMargin
    an[IllegalArgumentException] should be thrownBy
      PipelineSpec.parse(sinkYaml("files: 0"))
    an[IllegalArgumentException] should be thrownBy
      PipelineSpec.parse(sinkYaml("files: 2, clusterBy: [a]"))
    an[IllegalArgumentException] should be thrownBy
      PipelineSpec.parse(sinkYaml(
        "files: 2, buckets: 4, bucketBy: [a], table: t"))
  }

  test("orc: config sink -> config source round-trip is value-preserving") {
    PipelineRunner.run(spark,
      s"""name: orc_write
         |source: {format: parquet, path: "$sf/region.parquet"}
         |sink: {format: orc, path: "$io/region_orc", files: 1}
         |""".stripMargin)
    val back = PipelineRunner.read(spark, PipelineSpec.parse(
      s"""name: orc_read
         |source: {format: orc, path: "$io/region_orc"}
         |""".stripMargin).source)
    back.schema shouldBe Tables.region(spark, sf).schema
    back.orderBy(col("r_regionkey")).collect() shouldBe
      Tables.region(spark, sf).orderBy(col("r_regionkey")).collect()
  }

  test("orc: drift=strict accepts a conforming file and names drifted columns") {
    Tables.region(spark, sf).write.mode("overwrite").orc(s"$io/region_orc2")
    val declared = "r_regionkey INT, r_name STRING"
    val ok = PipelineRunner.read(spark, PipelineSpec.parse(
      s"""name: orc_drift_ok
         |source: {format: orc, path: "$io/region_orc2",
         |         schema: "$declared", drift: strict}
         |""".stripMargin).source)
    ok.count() shouldBe Tables.region(spark, sf).count()
    val e = intercept[IllegalArgumentException] {
      PipelineRunner.read(spark, PipelineSpec.parse(
        s"""name: orc_drift_bad
           |source: {format: orc, path: "$io/region_orc2",
           |         schema: "r_regionkey INT, r_name STRING, extra INT",
           |         drift: strict}
           |""".stripMargin).source).count()
    }
    e.getMessage should include("extra")
  }

  test("binaryfile: fixed-schema ingest, one row per blob, options pass through") {
    val store = new java.io.File(s"$io/blobs")
    org.apache.commons.io.FileUtils.deleteQuietly(store)
    store.mkdirs()
    java.nio.file.Files.write(store.toPath.resolve("a.bin"),
      Array[Byte](1, 2, 3))
    java.nio.file.Files.write(store.toPath.resolve("b.bin"),
      Array[Byte](9, 8, 7, 6))
    java.nio.file.Files.write(store.toPath.resolve("skip.txt"),
      Array[Byte](0))
    val df = PipelineRunner.read(spark, PipelineSpec.parse(
      s"""name: blob_read
         |source:
         |  format: binaryfile
         |  path: "$io/blobs"
         |  options: {pathGlobFilter: "*.bin"}
         |""".stripMargin).source)
    df.schema.fieldNames.toSet shouldBe
      Set("path", "modificationTime", "length", "content")
    val rows = df.select(
        element_at(split(col("path"), "/"), -1).as("f"), col("length"),
        col("content"))
      .orderBy(col("f")).collect()
    rows.map(_.getString(0)) shouldBe Array("a.bin", "b.bin")
    rows.map(_.getLong(1)) shouldBe Array(3L, 4L)
    rows(0).getAs[Array[Byte]]("content") shouldBe Array[Byte](1, 2, 3)
  }

  test("z-order layout from config: SQL emitter works as a derive expr, clusterBy gives disjoint z-ranges") {
    // the interleave emitter doubles as a config-surface expression —
    // Spark SQL shares DuckDB's `>> << & |` semantics on BIGINT, so the
    // SAME string drives the oracle and the YAML derive
    val zExpr = graft.ext.ZOrder.interleaveSql("xq", "yq", 8)
    // AQE (correctly) coalesces a test-sized shuffle to one file — pin it
    // off so the multi-file layout mechanics are what's asserted
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try PipelineRunner.run(spark,
      s"""name: zorder_layout
         |source: {format: parquet, path: "$sf/orders.parquet"}
         |transforms:
         |  - {op: derive, name: xq, expr: "o_custkey % 256"}
         |  - {op: derive, name: yq, expr: "CAST(floor(o_totalprice) AS BIGINT) % 256"}
         |  - op: derive
         |    name: z
         |    expr: "$zExpr"
         |sink: {format: parquet, path: "$io/orders_z", clusterBy: [z]}
         |""".stripMargin)
    finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    val files = partFiles(s"$io/orders_z")
    files.size should be > 1
    // clusterBy contract applied to the Morton key: each file owns a
    // DISJOINT z interval (this is what lets row-group stats prune on
    // both quantized dimensions — the locality bound is ZOrderSpec's)
    val ranges = files.map { f =>
      val d = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("z")), max(col("z"))).collect()(0)
      (d.getLong(0), d.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => hi should be <= lo2
      case _                      =>
    }
    // value preservation: the layout never changes content
    spark.read.parquet(s"$io/orders_z").count() shouldBe
      graft.core.Tables.orders(spark, sf).count()
    // derived z matches the column-algebra builder row-for-row
    spark.read.parquet(s"$io/orders_z")
      .where(col("z") =!= graft.ext.ZOrder.interleave(col("xq"), col("yq"), 8))
      .count() shouldBe 0L
  }

  test("binaryfile: declared schema and drift are rejected at parse time") {
    an[IllegalArgumentException] should be thrownBy PipelineSpec.parse(
      """name: bad
        |source: {format: binaryfile, path: "x", schema: "a INT"}
        |""".stripMargin)
    an[IllegalArgumentException] should be thrownBy PipelineSpec.parse(
      """name: bad
        |source: {format: binaryfile, path: "x", drift: allow}
        |""".stripMargin)
  }
}
