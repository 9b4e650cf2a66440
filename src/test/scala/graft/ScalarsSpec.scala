package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-function semantics kept OFF the bench hot path. from_json /
  * to_json are CodegenFallback expressions (interpreted, one full Jackson
  * parse per evaluation), so the benched JSON queries (i7, i8) extract
  * with codegen'd forms — json_tuple, str_to_map, cast, format_string.
  * The struct round-trip semantics those forms replaced are pinned here
  * on tiny data, where an interpreted expression costs nothing. */
class ScalarsSpec extends SparkSpecBase {
  import spark.implicits._

  private val kSchema = StructType(Seq(StructField("k", LongType)))

  test("I8: from_json/to_json struct round-trip ≡ the codegen'd json_tuple+format form") {
    val base = Seq((1L, """{"k":42}"""), (2L, """{"k":-7}"""), (3L, """{"k":0}"""))
      .toDF("id", "props")
      .selectExpr("id", "props", "json_tuple(props, 'k') AS k_str")
      .withColumn("parsed", from_json(col("props"), kSchema))
    val rows = base.select(
        col("id"),
        col("parsed").getField("k").as("k_struct"),
        to_json(col("parsed")).as("rebuilt_struct"),
        col("k_str").cast(LongType).as("k_cheap"),
        format_string("{\"k\":%d}", col("k_str").cast(LongType)).as("rebuilt_cheap"))
      .orderBy("id").collect()
    rows should have length 3
    rows.foreach { r =>
      withClue(s"id ${r.getLong(0)}: ") {
        r.getLong(1) shouldBe r.getLong(3)   // struct field ≡ cast of json_tuple
        r.getString(2) shouldBe r.getString(4) // to_json ≡ format_string rebuild
      }
    }
  }

  test("I8: from_json yields null fields on malformed input, not a throw") {
    // unparseable text, a wrong-typed field, and an absent field: in
    // every case the extraction comes back null (PERMISSIVE default) —
    // whether Spark nulls the whole struct or just the field is an
    // implementation detail the pipeline never depends on
    val got = Seq("not json", """{"k":"noncast"}""", """{"other":1}""")
      .toDF("props")
      .select(from_json(col("props"), kSchema).getField("k").as("k"))
      .collect()
    got.foreach(_.isNullAt(0) shouldBe true)
    // and a parseable field still extracts through the same path
    Seq("""{"k":9}""").toDF("props")
      .select(from_json(col("props"), kSchema).getField("k").as("k"))
      .head.getLong(0) shouldBe 9L
  }

  test("I8v: VARIANT survives a parquet round-trip with typed extraction intact") {
    // the 100 TB posture for semi-structured columns: store the parsed
    // VARIANT, not the source text — this asserts the storage round-trip
    // (write VariantType to parquet, read back, extract) is lossless for
    // typed fields, nested paths, and null/invalid inputs
    val dir = java.nio.file.Files.createTempDirectory("graft_variant").toString
    Seq(
      (1L, """{"k": 42, "nest": {"a": [1, 2, 3]}}"""),
      (2L, """{"k": -7}"""),
      (3L, "not json"),
      (4L, null)
    ).toDF("id", "props")
      .selectExpr("id", "try_parse_json(props) AS v")
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
      .selectExpr(
        "id",
        "variant_get(v, '$.k', 'int') AS k",
        "variant_get(v, '$.nest.a[2]', 'int') AS a2",
        "v IS NULL AS bad")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), r.getBoolean(3))).toMap
    back(1L) shouldBe ((Some(42), Some(3), false))
    back(2L) shouldBe ((Some(-7), None, false))
    back(3L) shouldBe ((None, None, true))
    back(4L) shouldBe ((None, None, true))
  }
}
