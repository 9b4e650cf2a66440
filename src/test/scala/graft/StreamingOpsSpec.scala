package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamOps

/** §2.L4 — watermark / late-data semantics, exercised with a two-file
  * ordered replay (maxFilesPerTrigger=1) so the watermark advances between
  * micro-batches and genuinely drops late rows — the single-batch path used
  * by the oracle queries can never drop anything (SURVEY §5.2 item 5). */
class StreamingOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def writeBatchFile(dir: String, name: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("epoch_s", "k")
      .select(timestamp_seconds($"epoch_s").as("ts"), $"k")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/$name")

  test("L4: rows later than the watermark are dropped from append aggregation") {
    val base = "/tmp/graft_stream_test/l4"
    StreamOps.rmrf(base)
    val in = s"$base/in"
    Files.createDirectories(Paths.get(in))
    val h = 3600L

    // Two sequential AvailableNow runs over ONE checkpoint: the watermark
    // persists across restarts, so run 2 starts with wm = 3h − 1h = 2h and
    // must drop the late row. (A single AvailableNow pass puts all files in
    // one batch — watermark never advances mid-batch.)
    def runOnce(runId: Int): Unit = {
      val stream = spark.readStream
        .schema("ts TIMESTAMP, k STRING")
        .parquet(s"$in/*")
        .withWatermark("ts", "1 hour")
        .groupBy(window($"ts", "1 hour"))
        .agg(count(lit(1)).as("n"), sort_array(collect_list($"k")).as("ks"))
        .select($"window.start".cast("string").as("w"), $"n", $"ks")
      val q = stream.writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$base/cp")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.write.mode("overwrite").parquet(s"$base/out/run${runId}_batch_$id")
        }
        .start()
      q.awaitTermination()
    }

    // run 1: events at hours 0..3 → checkpointed watermark = 2h
    writeBatchFile(in, "f1.parquet",
      Seq((0 * h, "a"), (1 * h, "a"), (2 * h, "a"), (3 * h, "a")))
    runOnce(1)
    // run 2: a late row back at hour 0 (< wm 2h → dropped) + an in-time row
    // at 4.5h → final watermark 3.5h, strictly between window ends
    writeBatchFile(in, "f2.parquet", Seq((0 * h + 60, "late"), (4 * h + 1800, "b")))
    runOnce(2)

    import scala.jdk.CollectionConverters._
    val dirs = scala.util.Using.resource(Files.list(Paths.get(s"$base/out")))(
      _.iterator().asScala.map(_.toString).toSeq)
    val rows = spark.read.parquet(dirs: _*)
      .as[(String, Long, Seq[String])].collect().sortBy(_._1)

    val emitted = rows.map(r => r._1.substring(11, 13) -> r._3.mkString(",")).toMap
    // hour-0 window emitted exactly once, holding ONLY the original event —
    // the late row was dropped, and no re-emission happened in run 2
    rows.count(_._1.substring(11, 13) == "00") shouldBe 1
    emitted("00") shouldBe "a"
    // hours 1 and 2 closed by the final watermark (3.5h)
    emitted.keySet should contain allOf ("01", "02")
    // hour 3 and 4 windows end after 3.5h → never emitted
    emitted.keySet should not contain "03"
    emitted.keySet should not contain "04"
  }

  test("A9: kafka source contract — validation, offline guard, semantics on the connector schema") {
    import graft.config.PipelineSpec
    import graft.pipeline.PipelineRunner
    // minimal valid spec parses; options pass through verbatim
    val ok = PipelineSpec.parse(
      """name: kbus
        |mode: streaming
        |source:
        |  format: kafka
        |  options: {kafka.bootstrap.servers: "broker:9092", subscribe: events,
        |            startingOffsets: earliest, maxOffsetsPerTrigger: "100000"}
        |""".stripMargin)
    ok.source.options("subscribe") shouldBe "events"
    ok.source.options("startingOffsets") shouldBe "earliest"
    // validation guard rails (each the config-platform fail-fast posture)
    def bad(src: String, mode: String = "mode: streaming\n") =
      the[IllegalArgumentException] thrownBy PipelineSpec.parse(
        s"name: kbad\n$mode" + s"source:\n$src")
    bad("  format: kafka\n  options: {subscribe: events}\n")
      .getMessage should include("kafka.bootstrap.servers")
    bad("  format: kafka\n  options: {kafka.bootstrap.servers: b, " +
      "subscribe: e, assign: x}\n")
      .getMessage should include("exactly one")
    bad("  format: kafka\n  schema: \"v STRING\"\n  options: " +
      "{kafka.bootstrap.servers: b, subscribe: e}\n")
      .getMessage should include("fixed by the connector")
    bad("  format: kafka\n  options: {kafka.bootstrap.servers: b, subscribe: e}\n",
      mode = "").getMessage should include("mode: streaming")
    // the YAML→reader translation genuinely reaches Spark's provider
    // lookup; offline (no connector jar in this image) the guard names
    // the jar to add instead of surfacing a bare lookup failure
    val err = the[IllegalStateException] thrownBy
      PipelineRunner.readStream(spark, ok.source)
    err.getMessage should include("spark-sql-kafka-0-10")
    // pipeline semantics over kafka's fixed record schema, stood in by a
    // MemoryStream with the same shape: the derive-the-payload + filter
    // chain every broker pipeline starts with, run as a REAL AvailableNow
    // micro-batch query
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val transforms = PipelineSpec.parse(
      """name: shape
        |source: {format: parquet, path: unused}
        |transforms:
        |  - {op: derive, name: payload, expr: "CAST(value AS STRING)"}
        |  - {op: filter, expr: "`partition` = 0"}
        |  - {op: select, cols: [topic, offset, payload]}
        |""".stripMargin).transforms
    val ms = MemoryStream[(Array[Byte], Array[Byte], String, Int, Long, Timestamp, Int)](spark)
    def rec(k: String, v: String, p: Int, off: Long) =
      (k.getBytes("UTF-8"), v.getBytes("UTF-8"), "events", p, off,
        new Timestamp(1700000000000L + off), 0)
    ms.addData(rec("k1", "hello", 0, 0L), rec("k2", "drop-me", 1, 1L),
      rec("k3", "world", 0, 2L))
    val out = StreamOps.runToBatch(spark, "kafka_standin",
      _ => transforms.foldLeft[DataFrame](ms.toDF().toDF("key", "value", "topic",
        "partition", "offset", "timestamp", "timestampType"))(
        (df, t) => PipelineRunner.applyTransform(spark, df, t)),
      "append")
    out.as[(String, Long, String)].collect().sortBy(_._2) shouldBe
      Seq(("events", 0L, "hello"), ("events", 2L, "world"))
  }

  test("A9 integration (GATED): the real {format: kafka} translation " +
    "runs against a live broker when the connector jar + broker are " +
    "present; otherwise cancels with a visible notice") {
    // the offline image ships no spark-sql-kafka-0-10 — this spec is the
    // standing claim-keeper: the DAY the jar lands on the classpath (and
    // GRAFT_KAFKA_BOOTSTRAP names a broker) the untouched YAML surface is
    // exercised against real Kafka. Until then the cancel message says
    // exactly what is missing; the MemoryStream contract spec above
    // keeps the schema/transform semantics tested offline.
    val connector = scala.util.Try(Class.forName(
      "org.apache.spark.sql.kafka010.KafkaSourceProvider")).isSuccess
    if (!connector)
      cancel("kafka connector (spark-sql-kafka-0-10 + kafka-clients) not " +
        "on the classpath — integration spec skipped; the MemoryStream " +
        "contract spec still covers the translation semantics")
    val bootstrap = sys.env.getOrElse("GRAFT_KAFKA_BOOTSTRAP",
      cancel("connector present but GRAFT_KAFKA_BOOTSTRAP is unset — " +
        "point it at host:port to run the live-broker integration"))
    import graft.config.PipelineSpec
    import graft.pipeline.PipelineRunner
    val topic = s"graft_it_${System.currentTimeMillis()}"
    // produce through the SAME connector (batch kafka sink) — no direct
    // kafka-clients API use, so this file compiles offline
    Seq("hello", "world").toDF("v")
      .selectExpr("CAST(v AS BINARY) AS value")
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic).save()
    val spec = PipelineSpec.parse(
      s"""name: kafka_live
         |mode: streaming
         |source:
         |  format: kafka
         |  options: {kafka.bootstrap.servers: "$bootstrap",
         |            subscribe: "$topic", startingOffsets: earliest}
         |""".stripMargin)
    val out = StreamOps.runToBatch(spark, "kafka_live",
      ss => PipelineRunner.readStream(ss, spec.source)
        .selectExpr("CAST(value AS STRING) AS payload"),
      "append")
    out.as[String].collect().sorted shouldBe Array("hello", "world")
  }

  test("L5: streaming dedup drops crafted duplicate keys within the stream") {
    val base = "/tmp/graft_stream_test/l5"
    StreamOps.rmrf(base)
    val in = s"$base/in"
    Files.createDirectories(Paths.get(in))
    Seq((1L, "x"), (1L, "x"), (2L, "y"), (2L, "y"), (3L, "z"))
      .toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(s"$in/f1.parquet")

    val stream = spark.readStream.schema("id BIGINT, v STRING").parquet(s"$in/*")
      .dropDuplicates("id")
    val out = s"$base/out"
    val q = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$base/cp")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$out/batch_$id")
      }
      .start()
    q.awaitTermination()

    import scala.jdk.CollectionConverters._
    val dirs = scala.util.Using.resource(Files.list(Paths.get(out)))(
      _.iterator().asScala.map(_.toString).toSeq)
    spark.read.parquet(dirs: _*).as[(Long, String)].collect()
      .sortBy(_._1) shouldBe Array((1L, "x"), (2L, "y"), (3L, "z"))
  }

  test("L10: streaming minhash_dedup replay equals the batch incremental result") {
    import java.nio.file.attribute.FileTime
    val base = "/tmp/graft_stream_test/l10"
    StreamOps.rmrf(base)
    val in = s"$base/in"
    Files.createDirectories(Paths.get(in))
    // chunk 2 near-duplicates docs PUBLISHED by chunk 1 (4≡1, 5≡3): a
    // within-batch-only dedup would keep them; the state composition kills
    // them. 6 is fresh and must survive batch 2.
    val chunk1 = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y"))
    val chunk2 = Seq((4L, "a b c"), (5L, "x y"), (6L, "fresh new"))
    Seq(("c1", chunk1), ("c2", chunk2)).zipWithIndex.foreach { case ((n, rows), i) =>
      val tmp = s"$base/tmp_$n"
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
      import scala.jdk.CollectionConverters._
      val part = scala.util.Using.resource(Files.list(Paths.get(tmp)))(
        _.iterator().asScala.find(_.toString.endsWith(".parquet")).get)
      val dst = Paths.get(in, s"chunk_$n.parquet")
      Files.move(part, dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(1700000000000L + i * 60000L))
    }

    def dedupYaml(mode: String, path: String, state: String): String = {
      val head =
        if (mode == "streaming")
          s"""name: l10_spec_stream
             |mode: streaming
             |source: {format: parquet, path: "$path", schema: auto, options: {maxFilesPerTrigger: "1"}}""".stripMargin
        else
          s"""name: l10_spec_batch
             |source: {format: parquet, path: "$path"}""".stripMargin
      s"""$head
         |transforms:
         |  - {op: tokenize, cols: [text], name: toks}
         |  - {op: minhash_dedup, cols: [doc_id, toks], threshold: 1.0, state_path: "$state"}
         |  - {op: select, cols: [doc_id, text]}
         |""".stripMargin
    }

    val streamed = graft.pipeline.PipelineRunner
      .run(spark, dedupYaml("streaming", in, s"$base/state_s")).passed
      .as[(Long, String)].collect().sortBy(_._1)

    // batch incremental reference: one batch run per chunk, shared state
    val batched = Seq("chunk_c1.parquet", "chunk_c2.parquet").flatMap { f =>
      graft.pipeline.PipelineRunner
        .run(spark, dedupYaml("batch", s"$in/$f", s"$base/state_b")).passed
        .as[(Long, String)].collect()
    }.sortBy(_._1)

    streamed shouldBe batched
    streamed.map(_._1) shouldBe Array(1L, 3L, 6L)
    // the streaming run's published state is the survivor corpus
    spark.read.parquet(s"$base/state_s").select("doc_id").as[Long]
      .collect().sorted shouldBe Array(1L, 3L, 6L)
  }

  test("L10: streaming semdedup replay equals the batch incremental result") {
    import java.nio.file.attribute.FileTime
    val base = "/tmp/graft_stream_test/l10_sem"
    StreamOps.rmrf(base)
    val in = s"$base/in"
    Files.createDirectories(Paths.get(in))
    // chunk 2: 4 is semantically 1, 5 is semantically 3, 6 is fresh
    val chunk1 = Seq((1L, Array(1.0, 0.0)), (2L, Array(0.999, 0.01)), (3L, Array(0.0, 1.0)))
    val chunk2 = Seq((4L, Array(0.998, 0.02)), (5L, Array(0.01, 0.999)), (6L, Array(0.707, 0.707)))
    Seq(("c1", chunk1), ("c2", chunk2)).zipWithIndex.foreach { case ((n, rows), i) =>
      val tmp = s"$base/tmp_$n"
      rows.toDF("vec_id", "emb").coalesce(1).write.mode("overwrite").parquet(tmp)
      import scala.jdk.CollectionConverters._
      val part = scala.util.Using.resource(Files.list(Paths.get(tmp)))(
        _.iterator().asScala.find(_.toString.endsWith(".parquet")).get)
      val dst = Paths.get(in, s"chunk_$n.parquet")
      Files.move(part, dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(1700000000000L + i * 60000L))
    }

    def yamlOf(streaming: Boolean, path: String, state: String): String = {
      val head =
        if (streaming)
          s"""name: l10_sem_stream
             |mode: streaming
             |source: {format: parquet, path: "$path", schema: auto, options: {maxFilesPerTrigger: "1"}}""".stripMargin
        else
          s"""name: l10_sem_batch
             |source: {format: parquet, path: "$path"}""".stripMargin
      s"""$head
         |transforms:
         |  - {op: semdedup, cols: [vec_id, emb], threshold: 0.95, k: 1, state_path: "$state"}
         |""".stripMargin
    }

    val streamed = graft.pipeline.PipelineRunner
      .run(spark, yamlOf(streaming = true, in, s"$base/state_s")).passed
      .select("vec_id").as[Long].collect().sorted
    val batched = Seq("chunk_c1.parquet", "chunk_c2.parquet").flatMap { f =>
      graft.pipeline.PipelineRunner
        .run(spark, yamlOf(streaming = false, s"$in/$f", s"$base/state_b")).passed
        .select("vec_id").as[Long].collect()
    }.sorted
    streamed shouldBe batched
    streamed shouldBe Array(1L, 3L, 6L)
  }

  test("L12: streaming decontaminate equals the batch result (per-doc, stateless)") {
    import java.nio.file.attribute.FileTime
    val base = "/tmp/graft_stream_test/l12"
    StreamOps.rmrf(base)
    val in = s"$base/in"
    Files.createDirectories(Paths.get(in))
    // benchmark: one doc; corpus: 10 is a verbatim leak of it, 11 shares a
    // 3-shingle mid-sentence, 12 is clean, 13 is too short to shingle
    Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$base/bench")
    val chunk1 = Seq((10L, "the quick brown fox jumps over the lazy dog"),
      (12L, "completely novel content nothing shared here at all"))
    val chunk2 = Seq((11L, "we saw the quick brown fox yesterday evening outside"),
      (13L, "too short"))
    Seq(("c1", chunk1), ("c2", chunk2)).zipWithIndex.foreach { case ((n, rows), i) =>
      val tmp = s"$base/tmp_$n"
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
      import scala.jdk.CollectionConverters._
      val part = scala.util.Using.resource(Files.list(Paths.get(tmp)))(
        _.iterator().asScala.find(_.toString.endsWith(".parquet")).get)
      val dst = Paths.get(in, s"chunk_$n.parquet")
      Files.move(part, dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    def yamlOf(streaming: Boolean): String = {
      val head =
        if (streaming)
          s"""name: l12_spec_stream
             |mode: streaming
             |source: {format: parquet, path: "$in", schema: auto, options: {maxFilesPerTrigger: "1"}}""".stripMargin
        else
          s"""name: l12_spec_batch
             |source: {format: parquet, path: "$in"}""".stripMargin
      s"""$head
         |transforms:
         |  - {op: tokenize, cols: [text], name: toks}
         |  - {op: decontaminate, cols: [doc_id, toks], k: 3, table: {format: parquet, path: "$base/bench"}}
         |  - {op: select, cols: [doc_id]}
         |""".stripMargin
    }
    val streamed = graft.pipeline.PipelineRunner.run(spark, yamlOf(true))
      .passed.as[Long].collect().sorted
    val batched = graft.pipeline.PipelineRunner.run(spark, yamlOf(false))
      .passed.as[Long].collect().sorted
    streamed shouldBe batched
    streamed shouldBe Array(12L, 13L) // leaks 10 and 11 dropped
  }

  test("L10: streaming minhash_dedup without state_path is rejected") {
    val base = "/tmp/graft_stream_test/l10_guard"
    StreamOps.rmrf(base)
    Files.createDirectories(Paths.get(base))
    Seq((1L, "a b")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$base/in")
    val ex = intercept[IllegalArgumentException] {
      graft.pipeline.PipelineRunner.run(spark,
        s"""name: l10_guard
           |mode: streaming
           |source: {format: parquet, path: "$base/in", schema: auto}
           |transforms:
           |  - {op: tokenize, cols: [text], name: toks}
           |  - {op: minhash_dedup, cols: [doc_id, toks], threshold: 1.0}
           |""".stripMargin)
    }
    ex.getMessage should include("state_path")
  }
}
