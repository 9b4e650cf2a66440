package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.streaming.StreamOps

/** SURVEY.md §2.L — Structured Streaming operators, each executed as a
  * real AvailableNow micro-batch stream (see StreamOps.runToBatch) and
  * oracle-checked against the equivalent batch SQL.
  *
  * Aggregates output only order-free exact stats (count/min/max) so
  * engine-side accumulation order cannot matter; window starts compare as
  * NTZ timestamps (both engines UTC).
  */
object Streaming extends QueryPack {
  import QueryDef._

  /** §2.L1 — tumbling 1-hour window by event_type. */
  val l1: QueryDef = m(
    "l1_tumbling_window",
    """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w_start, event_type,
      |  COUNT(*) AS n, min(value) AS min_v, max(value) AS max_v
      |FROM events GROUP BY w_start, event_type
      |ORDER BY w_start, event_type""".stripMargin) { (spark, dir) =>
    StreamOps.runToBatch(spark, "l1", ss => StreamOps.eventsStream(ss, dir)
      .withWatermark("event_ts", "1 hour")
      .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("min_v"), max(col("value")).as("max_v"))
      .select(col("window.start").cast(TimestampNTZType).as("w_start"),
        col("event_type"), col("n"), col("min_v"), col("max_v")), "update")
      .orderBy(col("w_start"), col("event_type"))
  }

  /** §2.L2 — sliding window (1 hour, 15-minute slide): each event lands in
    * 4 windows; oracle expands buckets with generate_series. */
  val l2: QueryDef = m(
    "l2_sliding_window",
    """WITH b AS (SELECT CAST(to_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 900) * 900 AS BIGINT)) AS TIMESTAMP) AS b15,
      |             event_id FROM events),
      |x AS (SELECT unnest(generate_series(b15 - INTERVAL 45 MINUTE, b15, INTERVAL 15 MINUTE)) AS w_start FROM b)
      |SELECT w_start, COUNT(*) AS n FROM x GROUP BY w_start ORDER BY w_start""".stripMargin) { (spark, dir) =>
    StreamOps.runToBatch(spark, "l2", ss => StreamOps.eventsStream(ss, dir)
      .withWatermark("event_ts", "1 hour")
      .groupBy(window(col("event_ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast(TimestampNTZType).as("w_start"), col("n")), "update")
      .orderBy(col("w_start"))
  }

  /** §2.L3 — session windows (30-minute gap) per user; oracle is the
    * classic islands-and-gaps construction. Two Spark semantics encoded:
    * (1) session ranges are [start, last+gap) — an event at exactly
    * prev+gap starts a NEW session, so the new-session flag uses >=;
    * (2) append mode only emits sessions CLOSED by the final watermark
    * (max event time − 1h delay), so the oracle applies the same cutoff:
    * last_ts + 30 min < max(ts) − 1 h. */
  val l3: QueryDef = m(
    "l3_session_window",
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events),
      |wm AS (SELECT max(t) - INTERVAL 1 HOUR AS w FROM e),
      |lagd AS (SELECT user_id, t, lag(t) OVER (PARTITION BY user_id ORDER BY t) AS pt FROM e),
      |flag AS (SELECT user_id, t,
      |  CASE WHEN pt IS NULL OR t - pt >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS f FROM lagd),
      |sess AS (SELECT user_id, t,
      |  SUM(f) OVER (PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING) AS sid FROM flag)
      |SELECT user_id, min(t) AS session_start, max(t) AS last_ts, COUNT(*) AS n
      |FROM sess CROSS JOIN wm GROUP BY user_id, sid, wm.w
      |HAVING max(t) + INTERVAL 30 MINUTE < wm.w
      |ORDER BY user_id, session_start""".stripMargin) { (spark, dir) =>
    StreamOps.runToBatch(spark, "l3", ss => StreamOps.eventsStream(ss, dir)
      .withWatermark("event_ts", "1 hour")
      .groupBy(session_window(col("event_ts"), "30 minutes"), col("user_id"))
      .agg(min(col("event_ts")).as("ss"), max(col("event_ts")).as("lt"),
        count(lit(1)).as("n"))
      .select(col("user_id"),
        col("ss").cast(TimestampNTZType).as("session_start"),
        col("lt").cast(TimestampNTZType).as("last_ts"), col("n")), "append")
      .orderBy(col("user_id"), col("session_start"))
  }

  /** §2.L4 — watermark / late-data semantics as a DRIVER-VISIBLE query
    * (StreamingOpsSpec owns the assertion-style variant): two sequential
    * AvailableNow runs over ONE checkpoint, so the watermark persists
    * across the restart and run 2 genuinely DROPS its late row — the
    * single-batch path used by the other L queries can never drop
    * anything. Fixture (constant epochs, rebuilt every call):
    * run 1 = in-time rows at hours 0..3 → checkpointed watermark 2 h;
    * run 2 = a late row back at hour 0 (< wm, dropped) + an in-time row
    * at 4.5 h → final watermark 3.5 h. Append mode emits exactly the
    * hour windows closed by the final watermark (0, 1, 2), holding only
    * never-late rows. The oracle states those semantics as a static
    * filter over the same files: batch-2 rows must beat the run-1
    * watermark (epoch ≥ 7200), and only windows ending by 3.5 h
    * (start < 10800) were closed. */
  val l4: QueryDef = m(
    "l4_watermark_late",
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS w_start_s,
      |  COUNT(*) AS n,
      |  array_to_string(list_sort(list(k)), ',') AS ks
      |FROM read_parquet('/tmp/graft_io/l4_replay/in/*/*.parquet')
      |WHERE (batch = 1 OR epoch(ts) >= 7200) AND epoch(ts) < 10800
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.streaming.Trigger
    val base = "/tmp/graft_io/l4_replay"
    StreamOps.rmrf(base)
    val in = s"$base/in"
    Files.createDirectories(Paths.get(in))
    val h = 3600L
    def writeBatch(name: String, batchId: Long, rows: Seq[(Long, String)]): Unit = {
      import spark.implicits._
      rows.toDF("epoch_s", "k")
        .select(timestamp_seconds(col("epoch_s")).as("ts"), col("k"),
          lit(batchId).as("batch"))
        .coalesce(1).write.mode("overwrite").parquet(s"$in/$name")
    }
    def runOnce(runId: Int): Unit = {
      val q = spark.readStream
        .schema("ts TIMESTAMP, k STRING, batch BIGINT")
        .parquet(s"$in/*")
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"), sort_array(collect_list(col("k"))).as("ks"))
        .select(col("window.start").as("w_start"), col("n"), col("ks"))
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$base/cp")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          b.write.mode("overwrite").parquet(s"$base/out/run${runId}_batch_$id")
        }
        .start()
      q.awaitTermination()
    }
    writeBatch("f1.parquet", 1, Seq((0, "a"), (h, "a"), (2 * h, "a"), (3 * h, "a")))
    runOnce(1)
    writeBatch("f2.parquet", 2, Seq((60, "late"), (4 * h + 1800, "b")))
    runOnce(2)
    import scala.jdk.CollectionConverters._
    val dirs = scala.util.Using.resource(Files.list(Paths.get(s"$base/out")))(
      _.iterator().asScala.map(_.toString).toSeq.sorted)
    spark.read.parquet(dirs: _*)
      .select(col("w_start").cast("long").as("w_start_s"), col("n"),
        array_join(col("ks"), ",").as("ks"))
      .orderBy(col("w_start_s"))
  }

  /** §2.L5 — streaming exact-once dedup by key within the stream. */
  val l5: QueryDef = m(
    "l5_streaming_dedup",
    """SELECT event_id, user_id, event_type FROM events
      |QUALIFY row_number() OVER (PARTITION BY event_id ORDER BY ts) = 1
      |ORDER BY event_id""".stripMargin) { (spark, dir) =>
    StreamOps.runToBatch(spark, "l5", ss => StreamOps.eventsStream(ss, dir)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .dropDuplicates("event_id"), "append")
      .orderBy(col("event_id"))
  }

  /** §2.L6 — stream ⋈ static broadcast dim enrichment + windowless agg. */
  val l6: QueryDef = m(
    "l6_stream_static_join",
    """SELECT n.n_name, COUNT(*) AS n_events
      |FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
      |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin) { (spark, dir) =>
    StreamOps.runToBatch(spark, "l6", ss => StreamOps.eventsStream(ss, dir)
      .join(broadcast(Tables.nation(ss, dir)), col("user_id") % 25 === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_events")), "update")
      .orderBy(col("n_name"))
  }

  /** §2.L7 — arbitrary stateful op (flatMapGroupsWithState): per-user
    * running counters, emitting the state after each batch (single batch
    * ⇒ final totals). Outputs are order-free (count / max). */
  val l7: QueryDef = m(
    "l7_stateful_counters",
    """SELECT user_id, COUNT(*) AS n, max(value) AS max_v
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (spark, dir) =>
    StreamOps.runToBatch(spark, "l7", { ss =>
      import ss.implicits._
      StreamOps.eventsStream(ss, dir)
        .select(col("user_id"), col("value")).as[(Long, Double)]
        .groupByKey(_._1)
        .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
          OutputMode.Update, GroupStateTimeout.NoTimeout) {
          (user: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
            var (n, mx) = state.getOption.getOrElse((0L, Double.NegativeInfinity))
            rows.foreach { case (_, v) => n += 1; if (v > mx) mx = v }
            state.update((n, mx))
            Iterator((user, n, mx))
        }
        .toDF("user_id", "n", "max_v")
    }, "update")
      .orderBy(col("user_id"))
  }

  /** §2.L8 — stream-stream interval join (append mode): purchases joined
    * to the same user's clicks in the preceding 2 hours. Both sides carry
    * a watermark and the join condition bounds event-time distance, so
    * Spark can size and evict join state — the canonical unbounded-join
    * shape. With the whole file in one micro-batch nothing is evicted
    * early and the result equals the batch interval join, which is the
    * oracle. At scale, state per side is (watermark delay + interval)
    * worth of rows, sharded by the equi-key. */
  val l8: QueryDef = m(
    "l8_stream_stream_join",
    """SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
      |  CAST(p.ts AS TIMESTAMP) AS purchase_ts
      |FROM events p JOIN events c
      |  ON p.user_id = c.user_id
      | AND p.event_type = 'purchase' AND c.event_type = 'click'
      | AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 2 HOUR
      | AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
      |ORDER BY purchase_id, click_id""".stripMargin) { (spark, dir) =>
    StreamOps.runToBatch(spark, "l8", { ss =>
      val p = StreamOps.eventsStream(ss, dir)
        .where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
          col("event_ts").as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      val c = StreamOps.eventsStream(ss, dir)
        .where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("event_ts").as("c_ts"))
        .withWatermark("c_ts", "1 hour")
      p.join(c, col("p_user") === col("c_user")
          && col("c_ts") >= col("p_ts") - expr("INTERVAL 2 HOURS")
          && col("c_ts") <= col("p_ts"))
        .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"),
          col("p_ts").cast(TimestampNTZType).as("purchase_ts"))
    }, "append")
      .orderBy(col("purchase_id"), col("click_id"))
  }

  /** §2.L7 modern variant (NS) — the same per-user running counters on
    * Spark 4's transformWithState / StatefulProcessor API
    * (flatMapGroupsWithState's successor: named typed state cells with
    * per-state TTL, timers, and schema'd state store). One ValueState
    * cell per user holds (n, min); update-mode emission after the single
    * AvailableNow batch is the final total, oracle-checked like l7. At
    * scale the state shards by the grouping key exactly like the legacy
    * API — this query pins the forward-looking surface. */
  val l9: QueryDef = m(
    "l9_transform_with_state",
    """SELECT user_id, COUNT(*) AS n, min(value) AS min_v
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (spark, dir) =>
    StreamOps.runToBatch(spark, "l9", { ss =>
      import ss.implicits._
      // transformWithState keeps several column families per state cell —
      // the RocksDB provider (bundled rocksdbjni) is its required store;
      // scoped to this stream's CLONED session only, the default
      // HDFS-backed provider stays in place for every other query
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      StreamOps.eventsStream(ss, dir)
        .select(col("user_id"), col("value")).as[(Long, Double)]
        .groupByKey(_._1)
        .transformWithState(
          new graft.streaming.UserStatsProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Update)
        .toDF("user_id", "n", "min_v")
    }, "update")
      .orderBy(col("user_id"))
  }

  /** §2.L10 — streaming incremental near-dup dedup: the `minhash_dedup`
    * curation gate with `state_path` under `mode: streaming`. Each
    * micro-batch LSH-clusters against the published survivor corpus,
    * emits its survivors, then appends them to state (publish-then-
    * advance per batch — see StreamOps.runToBatch's perBatch contract).
    *
    * Oracle-checkable because the staging keeps the incremental election
    * equal to the global one: the corpus is split into doc_id-range chunk
    * files consumed one per trigger in range order (distinct mtimes drive
    * the file-stream's ordering), so the earliest batch containing a
    * token set also contains that set's global-min doc_id, and at
    * threshold 1.0 set-equality is transitive — the streamed survivors
    * are exactly ep7's batch answer. Same oracle as ep7, so the
    * streaming route cross-checks the batch route. */
  val l10: QueryDef = m(
    "l10_streaming_minhash_dedup",
    """SELECT doc_id, lang, source, n_chars FROM documents
      |QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY
      |  to_json(list_sort(list_distinct(string_split(lower(text), ' ')))))
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    import scala.jdk.CollectionConverters._
    val base = "/tmp/graft_io/l10_stream"
    StreamOps.rmrf(base)
    val src = s"$base/src"
    Files.createDirectories(Paths.get(src))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val bounds = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val step = (hi - lo) / 3 + 1
    (0 until 3).foreach { i =>
      val tmp = s"$base/tmp_$i"
      docs.where(col("doc_id") >= lo + i * step &&
          col("doc_id") < lo + (i + 1) * step)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = scala.util.Using.resource(Files.list(Paths.get(tmp)))(
        _.iterator().asScala.find(_.toString.endsWith(".parquet")).get)
      val dst = Paths.get(src, f"chunk_$i%02d.parquet")
      Files.move(part, dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    val yaml =
      s"""name: l10_stream_minhash
         |mode: streaming
         |source: {format: parquet, path: "$src", schema: auto, options: {maxFilesPerTrigger: "1"}}
         |transforms:
         |  - {op: tokenize, cols: [text], name: toks}
         |  - {op: minhash_dedup, cols: [doc_id, toks], threshold: 1.0, state_path: "$base/state"}
         |  - {op: select, cols: [doc_id, lang, source, n_chars]}
         |  - {op: sort, cols: [doc_id]}
         |""".stripMargin
    graft.pipeline.PipelineRunner.run(spark, yaml).passed
  }

  /** §2.A10-ext — exactly-once streaming ingest into the ACID table
    * (`graft_table` sink under `mode: streaming`): each micro-batch is
    * one log commit stamped with a (appId, batchId) txn action, so a
    * replayed batch no-ops instead of double-appending — the lakehouse
    * idempotent-writes protocol (cf. Delta's txn action), on our own
    * commit log. Three doc-ordered chunk files → three commits; the
    * result is read back THROUGH the table (snapshot of the latest
    * version), so the oracle checks the whole ingest path end-to-end. */
  val l11: QueryDef = m(
    "l11_streaming_acid_ingest",
    """SELECT event_id, user_id, event_type, value FROM events
      |ORDER BY event_id""".stripMargin) { (spark, dir) =>
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    import scala.jdk.CollectionConverters._
    val base = "/tmp/graft_io/l11_acid"
    StreamOps.rmrf(base)
    val src = s"$base/src"
    Files.createDirectories(Paths.get(src))
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val bounds = ev.agg(min(col("event_id")), max(col("event_id"))).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val step = (hi - lo) / 3 + 1
    (0 until 3).foreach { i =>
      val tmp = s"$base/tmp_$i"
      ev.where(col("event_id") >= lo + i * step &&
          col("event_id") < lo + (i + 1) * step)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = scala.util.Using.resource(Files.list(Paths.get(tmp)))(
        _.iterator().asScala.find(_.toString.endsWith(".parquet")).get)
      val dst = Paths.get(src, f"chunk_$i%02d.parquet")
      Files.move(part, dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    val table = s"$base/table"
    graft.pipeline.PipelineRunner.run(spark,
      s"""name: l11_acid_ingest
         |mode: streaming
         |source: {format: parquet, path: "$src", schema: auto, options: {maxFilesPerTrigger: "1"}}
         |transforms: []
         |sink: {format: graft_table, path: "$table", mode: append}
         |""".stripMargin)
    graft.tables.GraftTable.read(spark, table).orderBy(col("event_id"))
  }

  /** §2.J12-ext — streaming decontamination: the benchmark-overlap gate
    * running per micro-batch against the static broadcast shingle set.
    * Unlike the dedup gates this needs NO state: the verdict is per-DOC
    * and a doc is one row, so per-batch application IS the batch answer
    * (the op just isn't a pure stream transform — explode + distinct +
    * join-back). Mirrors ep13's batch curation chain; same oracle
    * construction as j12 (docs sharing any 5-shingle with the doc_id<20
    * benchmark are dropped). */
  val l12: QueryDef = m(
    "l12_streaming_decontaminate",
    """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 5 + 2),
      |  i -> array_to_string(list_slice(toks, i, i + 4), ' '))) AS g
      |  FROM d WHERE len(toks) >= 5),
      |bench AS (SELECT DISTINCT g FROM sh WHERE doc_id < 20),
      |bad AS (SELECT DISTINCT s.doc_id FROM sh s JOIN bench b ON s.g = b.g)
      |SELECT doc_id, lang, source, n_chars FROM documents
      |WHERE doc_id >= 20 AND doc_id NOT IN (SELECT doc_id FROM bad)
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    import scala.jdk.CollectionConverters._
    val base = "/tmp/graft_io/l12_decon"
    StreamOps.rmrf(base)
    val src = s"$base/src"
    Files.createDirectories(Paths.get(src))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val bounds = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val step = (hi - lo) / 3 + 1
    (0 until 3).foreach { i =>
      val tmp = s"$base/tmp_$i"
      docs.where(col("doc_id") >= lo + i * step &&
          col("doc_id") < lo + (i + 1) * step)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = scala.util.Using.resource(Files.list(Paths.get(tmp)))(
        _.iterator().asScala.find(_.toString.endsWith(".parquet")).get)
      val dst = Paths.get(src, f"chunk_$i%02d.parquet")
      Files.move(part, dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    graft.pipeline.PipelineRunner.run(spark,
      s"""name: l12_decon
         |mode: streaming
         |source: {format: parquet, path: "$src", schema: auto, options: {maxFilesPerTrigger: "1"}}
         |transforms:
         |  - {op: filter, expr: "doc_id >= 20"}
         |  - {op: tokenize, cols: [text], name: toks}
         |  - {op: decontaminate, cols: [doc_id, toks], k: 5, where: "doc_id < 20", table: {format: parquet, path: "$dir/documents.parquet"}}
         |  - {op: select, cols: [doc_id, lang, source, n_chars]}
         |  - {op: sort, cols: [doc_id]}
         |""".stripMargin).passed
  }

  /** §2.L13 — the ACID table as a STREAMING SOURCE (the dual of l11's
    * streaming sink): commit versions are the offsets, so the query
    * checkpoint + the commit log give exactly-once table-to-table
    * incremental pipelines with no extra bookkeeping. Planning is log
    * metadata only (never a data-dir listing); each delivered row is
    * stamped with its commit version. The fail-loud change-commit rule,
    * OPTIMIZE invisibility, and checkpoint resume are pinned in
    * GraftTableSpec; the oracle pins delivered content + version stamps. */
  val l13: QueryDef = m(
    "l13_streaming_table_source",
    """SELECT o_orderkey, o_totalprice, version FROM (
      |  SELECT o_orderkey, o_totalprice, CAST(1 AS BIGINT) AS version
      |  FROM orders WHERE o_orderkey % 3 = 0
      |  UNION ALL
      |  SELECT o_orderkey, o_totalprice, CAST(2 AS BIGINT) AS version
      |  FROM orders WHERE o_orderkey % 3 = 1)
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    val root = "/tmp/graft_io/acid_stream_src"
    StreamOps.rmrf(root)
    val base = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"))
    graft.tables.GraftTable.write(spark,
      base.where(col("o_orderkey") % 3 === 0), root, "overwrite") // v1
    graft.tables.GraftTable.write(spark,
      base.where(col("o_orderkey") % 3 === 1), root, "append")    // v2
    graft.pipeline.PipelineRunner.run(spark,
      s"""name: l13_table_source
         |mode: streaming
         |source: {format: graft_table, path: "$root"}
         |transforms:
         |  - {op: rename, cols: ["_commit_version:version"]}
         |  - {op: sort, cols: [o_orderkey]}
         |""".stripMargin).passed
  }

  /** §2.L14 — CONTINUOUS materialized-view maintenance: `mode:
    * mv_refresh` + `streaming: true` composes the l13 streaming table
    * source (offsets = commit versions, maxVersionsPerTrigger paces) with
    * ep24's incremental refresh — each micro-batch advances the view to
    * its own high-watermark version, so the MV tracks the base
    * version-by-version instead of one jump to latest. Exactly-once
    * rides the MV's txn cursor, not the stream checkpoint: the second
    * run below starts a FRESH checkpoint, replays every already-applied
    * version as a no-op (lastTxn ≥ watermark), and only v4 refreshes.
    * The oracle is the from-scratch aggregate over the full base. */
  val l14: QueryDef = m(
    "l14_streaming_mv",
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2)
      |    AS DECIMAL(18,2)) AS DOUBLE) AS sum_v,
      |  max(o_orderkey) AS last_key
      |FROM orders GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
    import graft.tables.GraftTable
    val base = "/tmp/graft_io/l14_mv_base"
    val view = "/tmp/graft_io/l14_mv_view"
    StreamOps.rmrf(base); StreamOps.rmrf(view)
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    (0 until 3).foreach { i =>                                 // v1..v3
      GraftTable.write(spark, o.where(col("o_orderkey") % 4 === i),
        base, if (i == 0) "overwrite" else "append")
    }
    val yaml =
      s"""name: l14_mv
         |mode: mv_refresh
         |streaming: true
         |source: {format: graft_table, path: "$base",
         |  options: {maxVersionsPerTrigger: "1"}}
         |mv:
         |  path: "$view"
         |  keys: [o_orderstatus]
         |  aggs: ["count() AS n",
         |         "sum(CAST(o_totalprice AS DECIMAL(12,2))) AS sum_v",
         |         "max(o_orderkey) AS last_key"]
         |""".stripMargin
    graft.pipeline.PipelineRunner.run(spark, yaml) // v1 full, v2/v3 incr
    GraftTable.write(spark, o.where(col("o_orderkey") % 4 === 3),
      base, "append")                                          // v4
    graft.pipeline.PipelineRunner.run(spark, yaml).passed // v1-v3 no-op, v4 incr
      .select(col("o_orderstatus"), col("n"),
        col("sum_v").cast("double").as("sum_v"), col("last_key"))
      .orderBy(col("o_orderstatus"))
  }

  /** §2.L15 — the STREAMING change data feed (Delta's readChangeFeed
    * stream): `withImages: true` on the streaming table source delivers
    * every commit's change rows classified `_change_type ∈ {insert,
    * update_preimage, update_postimage, delete}` + `_commit_version` —
    * DML versions stream their cdf/ sidecars (rows carry the column),
    * appends stream their adds stamped with a partition-constant
    * `insert`, layout-only versions stream nothing, and a change version
    * without sidecars fails loud. This is the continuous dual of ep34's
    * batch feed: a downstream replica/MV consumes retractions as they
    * commit, with the query checkpoint as the only cursor. The oracle is
    * ep34's exact reconstruction over the same DML history. */
  val l15: QueryDef = m(
    "l15_streaming_cdf",
    """WITH o AS (SELECT o_orderkey, o_totalprice FROM orders)
      |SELECT * FROM (
      |  SELECT o_orderkey, o_totalprice, 'insert' AS _change_type,
      |         CAST(1 AS BIGINT) AS _commit_version FROM o
      |  UNION ALL
      |  SELECT o_orderkey, o_totalprice, 'update_preimage', 3 FROM o
      |  WHERE o_orderkey % 100 = 0
      |  UNION ALL
      |  SELECT o_orderkey, o_totalprice * 2, 'update_postimage', 3 FROM o
      |  WHERE o_orderkey % 100 = 0
      |  UNION ALL
      |  SELECT o_orderkey, o_totalprice, 'delete', 4 FROM o
      |  WHERE o_orderkey % 100 = 50
      |  UNION ALL
      |  SELECT o_orderkey, o_totalprice, 'update_preimage', 5 FROM o
      |  WHERE o_orderkey % 100 = 25
      |  UNION ALL
      |  SELECT o_orderkey, o_totalprice + 1000, 'update_postimage', 5 FROM o
      |  WHERE o_orderkey % 100 = 25
      |  UNION ALL
      |  SELECT o_orderkey + 5000000, o_totalprice, 'insert', 5 FROM o
      |  WHERE o_orderkey % 100 = 75
      |)
      |ORDER BY _commit_version, _change_type, o_orderkey""".stripMargin) { (spark, dir) =>
    import graft.tables.GraftTable
    val root = "/tmp/graft_io/l15_cdf_orders"
    StreamOps.rmrf(root)
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"))
    GraftTable.write(spark, o, root, "overwrite")                     // v1
    GraftTable.setProperty(root, "changeDataFeed", Some("true"))      // v2
    GraftTable.updateWhere(spark, root, "o_orderkey % 100 = 0",       // v3
      Map("o_totalprice" -> "o_totalprice * 2"))
    GraftTable.deleteWhere(spark, root, "o_orderkey % 100 = 50")      // v4
    val upserts = o.where(col("o_orderkey") % 100 === 25)             // v5
      .withColumn("o_totalprice", col("o_totalprice") + 1000)
      .unionByName(o.where(col("o_orderkey") % 100 === 75)
        .withColumn("o_orderkey", col("o_orderkey") + 5000000L))
    GraftTable.merge(spark, root, upserts, Seq("o_orderkey"))
    graft.pipeline.PipelineRunner.run(spark,
      s"""name: l15_cdf
         |mode: streaming
         |source: {format: graft_table, path: "$root",
         |  options: {withImages: "true"}}
         |transforms:
         |  - {op: sort, cols: [_commit_version, _change_type, o_orderkey]}
         |""".stripMargin).passed
  }

  /** §2.L16 — STREAMING CDF → MV, direct retraction consumption: the MV
    * consumes the `withImages` change stream itself (one stream, one
    * signed merge per micro-batch — count := Σ±1, sum := Σ(e·±1) —
    * never a per-version refresh call, never a feed re-read) over a
    * DML-heavy history: update, delete, and merge versions all apply
    * through their classified pre/post images. Exactly-once rides the
    * MV's txn cursor, proven the hard way: the second run replays the
    * WHOLE history on a fresh checkpoint (the runner's checkpoints are
    * run-scoped) — fully-consumed batches no-op, and the batch
    * straddling the cursor applies only its rows past it. The oracle
    * reconstructs the final table state in SQL and aggregates it; the
    * answer must equal what l14's per-version refresh would produce. */
  val l16: QueryDef = m(
    "l16_streaming_cdf_mv",
    """WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      |final AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CASE WHEN o_orderkey % 100 = 25 THEN o_totalprice + 1000
      |         WHEN o_orderkey % 100 = 0 THEN o_totalprice * 2
      |         WHEN o_orderkey % 100 = 30 THEN o_totalprice + 7
      |         ELSE o_totalprice END AS price
      |  FROM o WHERE o_orderkey % 100 <> 50
      |  UNION ALL
      |  SELECT o_orderkey + 5000000, o_orderstatus, o_totalprice FROM o
      |  WHERE o_orderkey % 100 = 75
      |)
      |SELECT o_orderstatus, COUNT(*) AS n,
      |       COUNT(CAST(price AS DECIMAL(12,2))) AS n_v,
      |       CAST(SUM(CAST(price AS DECIMAL(12,2))) AS DOUBLE) AS sum_v
      |FROM final GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
    import graft.tables.GraftTable
    val base = "/tmp/graft_io/l16_cdfmv_base"
    val view = "/tmp/graft_io/l16_cdfmv_view"
    StreamOps.rmrf(base); StreamOps.rmrf(view)
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    GraftTable.write(spark, o, base, "overwrite")                     // v1
    GraftTable.setProperty(base, "changeDataFeed", Some("true"))      // v2
    GraftTable.updateWhere(spark, base, "o_orderkey % 100 = 0",       // v3
      Map("o_totalprice" -> "o_totalprice * 2"))
    GraftTable.deleteWhere(spark, base, "o_orderkey % 100 = 50")      // v4
    val upserts = o.where(col("o_orderkey") % 100 === 25)             // v5
      .withColumn("o_totalprice", col("o_totalprice") + 1000)
      .unionByName(o.where(col("o_orderkey") % 100 === 75)
        .withColumn("o_orderkey", col("o_orderkey") + 5000000L))
    GraftTable.merge(spark, base, upserts, Seq("o_orderkey"))
    val yaml =
      s"""name: l16_mv
         |mode: mv_refresh
         |streaming: true
         |source: {format: graft_table, path: "$base",
         |  options: {withImages: "true", maxVersionsPerTrigger: "2"}}
         |mv:
         |  path: "$view"
         |  keys: [o_orderstatus]
         |  aggs: ["count() AS n",
         |         "count(CAST(o_totalprice AS DECIMAL(12,2))) AS n_v",
         |         "sum(CAST(o_totalprice AS DECIMAL(12,2))) AS sum_v"]
         |""".stripMargin
    graft.pipeline.PipelineRunner.run(spark, yaml) // consumes v1..v5
    GraftTable.updateWhere(spark, base, "o_orderkey % 100 = 30",      // v6
      Map("o_totalprice" -> "o_totalprice + 7"))
    // fresh-checkpoint full replay: v1..v5 batches no-op on the txn
    // cursor; the straddling batch applies only v6's retractions
    graft.pipeline.PipelineRunner.run(spark, yaml).passed
      .select(col("o_orderstatus"), col("n"), col("n_v"),
        col("sum_v").cast("double").as("sum_v"))
      .orderBy(col("o_orderstatus"))
  }

  override def defs: Seq[QueryDef] = Seq(l1, l2, l3, l4, l5, l6, l7, l8, l9, l10, l11, l12, l13, l14, l15, l16)
}
