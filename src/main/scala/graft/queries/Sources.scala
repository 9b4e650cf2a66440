package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.pipeline.PipelineRunner

/** SURVEY.md §2.A — non-parquet sources and sinks, plus the EP1
  * config-driven pipeline run as an oracle-checked query.
  *
  * A3/A4/A7 protocol: the engine first WRITES the format under
  * /tmp/graft_io (deterministic content, coalesce(1) for a single file),
  * reads it back through the config-driven reader, and the DuckDB oracle
  * reads the same files — so the round-trip (writer ∘ reader) is what is
  * actually verified, covering A6/A8 sinks in the same pass.
  */
object Sources extends QueryPack {
  import QueryDef._

  private val ioDir = "/tmp/graft_io"

  /** §2.A3 + A8 — CSV sink → config-driven CSV source with declared
    * schema, header, delimiter, FAILFAST. */
  val a3: QueryDef = m(
    "a3_csv_roundtrip",
    s"""SELECT n_nationkey, n_name, n_regionkey
       |FROM read_csv('$ioDir/nation_csv/*.csv', delim = ';', header = true,
       |  columns = {'n_nationkey': 'BIGINT', 'n_name': 'VARCHAR', 'n_regionkey': 'BIGINT'})
       |ORDER BY n_nationkey""".stripMargin) { (spark, dir) =>
    Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .coalesce(1).write.mode("overwrite")
      .option("header", "true").option("delimiter", ";")
      .csv(s"$ioDir/nation_csv")
    spark.read
      .schema("n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT")
      .option("header", "true").option("delimiter", ";").option("mode", "FAILFAST")
      .csv(s"$ioDir/nation_csv")
      .orderBy(col("n_nationkey"))
  }

  /** §2.A3 PERMISSIVE path — corrupt-record capture and quarantine split.
    * A deliberately malformed CSV (type errors only: DuckDB's
    * ignore_errors skips exactly the rows Spark marks corrupt; missing-
    * column rows would diverge — Spark null-pads them clean) is read
    * PERMISSIVE with columnNameOfCorruptRecord; the query returns the
    * clean half, the oracle reads the same file with ignore_errors=true.
    * SourcesSpec asserts the quarantined half (raw lines preserved for
    * replay). */
  val a3b: QueryDef = m(
    "a3b_csv_permissive",
    s"""SELECT id, name, val
       |FROM read_csv('$ioDir/malformed_csv/data.csv', delim = ';', header = true,
       |  columns = {'id': 'BIGINT', 'name': 'VARCHAR', 'val': 'DOUBLE'},
       |  ignore_errors = true)
       |ORDER BY id""".stripMargin) { (spark, dir) =>
    writeMalformedCsv()
    permissiveCsv(spark)
      .where(col("_corrupt").isNull)
      .select(col("id"), col("name"), col("val"))
      .orderBy(col("id"))
  }

  /** §2.A3 MULTILINE path — quoted records with embedded newlines,
    * embedded delimiters, and RFC-4180 doubled quotes, read through the
    * config surface (`multiLine: true` + `escape: '"'` pass through the
    * source options verbatim). The fixture is hand-written — a Spark
    * write would quote for us and prove nothing. Scale note: multiLine
    * disables line-boundary file SPLITTING (a record can span a split
    * point, so each file parses as one unit) — keep multiline CSV inputs
    * in many small-to-medium files, or convert to parquet at the edge;
    * the option is for ingesting what exists, not a 100 TB steady state. */
  val a3c: QueryDef = m(
    "a3c_csv_multiline",
    s"""SELECT id, note, val
       |FROM read_csv('$ioDir/multiline_csv/data.csv', delim = ';', header = true,
       |  columns = {'id': 'BIGINT', 'note': 'VARCHAR', 'val': 'DOUBLE'})
       |ORDER BY id""".stripMargin) { (spark, dir) =>
    val p = java.nio.file.Paths.get(s"$ioDir/multiline_csv")
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.writeString(p.resolve("data.csv"),
      "id;note;val\n" +
        "1;\"line one\nline two\";1.5\n" +
        "2;\"has;delimiter\";2.0\n" +
        "3;\"quote \"\"inside\"\" here\";3.25\n" +
        "4;plain;4.0\n")
    val spec = graft.config.PipelineSpec.parse(
      s"""name: a3c_multiline
         |source:
         |  format: csv
         |  path: "$ioDir/multiline_csv"
         |  schema: "id BIGINT, note STRING, val DOUBLE"
         |  options: {header: "true", delimiter: ";", multiLine: "true",
         |            escape: "\\"", mode: FAILFAST}
         |""".stripMargin)
    PipelineRunner.read(spark, spec.source).orderBy(col("id"))
  }

  /** The malformed fixture + PERMISSIVE reader, shared with SourcesSpec. */
  def writeMalformedCsv(): Unit = {
    val p = java.nio.file.Paths.get(s"$ioDir/malformed_csv")
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.writeString(p.resolve("data.csv"),
      """id;name;val
        |1;alpha;1.5
        |x;bad_id;2.0
        |2;beta;oops
        |3;gamma;3.25
        |y;both;zz
        |4;delta;4.0
        |""".stripMargin)
  }

  def permissiveCsv(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame =
    spark.read
      .schema("id BIGINT, name STRING, val DOUBLE, _corrupt STRING")
      .option("header", "true").option("delimiter", ";")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(s"$ioDir/malformed_csv")

  /** §2.A4 + A8 — JSON-lines sink → source with declared schema. */
  val a4: QueryDef = m(
    "a4_json_roundtrip",
    s"""SELECT r_regionkey, r_name
       |FROM read_json('$ioDir/region_json/*.json',
       |  columns = {'r_regionkey': 'BIGINT', 'r_name': 'VARCHAR'}, format = 'newline_delimited')
       |ORDER BY r_regionkey""".stripMargin) { (spark, dir) =>
    Tables.region(spark, dir)
      .select(col("r_regionkey"), col("r_name"))
      .coalesce(1).write.mode("overwrite").json(s"$ioDir/region_json")
    spark.read
      .schema("r_regionkey BIGINT, r_name STRING")
      .json(s"$ioDir/region_json")
      .orderBy(col("r_regionkey"))
  }

  /** ADF copy-activity XML parity through Spark 4's BUILT-IN XML
    * datasource (ships in spark-sql since 4.0 — zero external jars). The
    * engine WRITES nation as XML (explicit rowTag), reads it back through
    * the config-driven `{format: xml}` source with a declared schema, and
    * the oracle is the nation parquet itself — the same value-preserving
    * round-trip contract as a5's JDBC case (DuckDB has no XML reader, so
    * the round-trip against the parquet truth IS the strongest available
    * oracle, and it is a full hash match, not rows-only). Scale note:
    * like multiline CSV, XML records can span line boundaries, so files
    * are the parallelism unit — many medium files, or convert to parquet
    * at the edge. */
  val a4b: QueryDef = m(
    "a4b_xml_roundtrip",
    """SELECT n_nationkey, n_name, n_regionkey FROM nation
      |ORDER BY n_nationkey""".stripMargin) { (spark, dir) =>
    Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .coalesce(1).write.mode("overwrite")
      .option("rowTag", "nation").option("rootTag", "nations")
      .format("xml").save(s"$ioDir/nation_xml")
    val spec = graft.config.PipelineSpec.parse(
      s"""name: a4b_xml
         |source:
         |  format: xml
         |  path: "$ioDir/nation_xml"
         |  schema: "n_nationkey INT, n_name STRING, n_regionkey INT"
         |  options: {rowTag: nation}
         |""".stripMargin)
    PipelineRunner.read(spark, spec.source).orderBy(col("n_nationkey"))
  }

  /** A-tier ORC parity — Spark's second built-in columnar format, wired
    * through the config surface in BOTH directions: the pipeline WRITES
    * supplier as ORC via a config sink (compacted to one file with
    * `files: 1`), then reads it back via `{format: orc}` (self-describing
    * — no declared schema needed, same as parquet). DuckDB has no ORC
    * reader, so the oracle is the supplier parquet itself: the round-trip
    * must be value-preserving — the a4b/a5 contract, a full hash match.
    * Scale note: ORC rides the exact same vectorized-scan + min/max
    * row-group pruning machinery as parquet in Spark, so every layout
    * play elsewhere in this repo (partitionBy, clusterBy ranges,
    * compaction) applies verbatim. */
  val a4c: QueryDef = m(
    "a4c_orc_roundtrip",
    """SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
      |ORDER BY s_suppkey""".stripMargin) { (spark, dir) =>
    PipelineRunner.run(spark,
      s"""name: a4c_orc_write
         |source: {format: parquet, path: "$dir/supplier.parquet"}
         |transforms:
         |  - {op: select, cols: [s_suppkey, s_name, s_nationkey, s_acctbal]}
         |sink: {format: orc, path: "$ioDir/supplier_orc", files: 1}
         |""".stripMargin)
    val spec = graft.config.PipelineSpec.parse(
      s"""name: a4c_orc_read
         |source: {format: orc, path: "$ioDir/supplier_orc"}
         |""".stripMargin)
    PipelineRunner.read(spark, spec.source).orderBy(col("s_suppkey"))
  }

  /** §2.A5 — JDBC round-trip through an IN-PROCESS Derby database (the
    * embedded driver ships with Spark's jars — zero new dependencies,
    * works offline). The engine WRITES nation to a Derby table, then
    * reads it back through the config-driven `{format: jdbc}` source —
    * so `spark.read.format("jdbc")` genuinely executes, not just the
    * config model. The oracle is the nation parquet itself: the
    * round-trip must be value-preserving (same contract as a3/a4).
    *
    * Scale note: this demo reads over ONE connection. At real scale a
    * JDBC source must declare partitionColumn/lowerBound/upperBound/
    * numPartitions (the runner passes options through verbatim) so the
    * scan fans out across executors — ConfigPipelineSpec exercises that
    * 4-partition parallel-read path, plus pushed-down predicates. */
  val a5: QueryDef = m(
    "a5_jdbc_roundtrip",
    """SELECT n_nationkey, n_name, n_regionkey FROM nation
      |ORDER BY n_nationkey""".stripMargin) { (spark, dir) =>
    // keep derby.log out of the repo working dir
    System.setProperty("derby.system.home", s"$ioDir/derby")
    val url = "jdbc:derby:memory:graft;create=true"
    Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .write.format("jdbc")
      .option("url", url).option("dbtable", "A5_NATION")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .mode("overwrite").save()
    val spec = graft.config.PipelineSpec.parse(
      s"""name: a5_jdbc
         |source:
         |  format: jdbc
         |  options: {url: "$url", dbtable: A5_NATION,
         |            driver: org.apache.derby.jdbc.EmbeddedDriver}
         |""".stripMargin)
    PipelineRunner.read(spark, spec.source)
      .orderBy(col("n_nationkey"))
  }

  /** §2.A7 — partitioned parquet sink, read back hive-style (DuckDB
    * hive_partitioning recovers the partition column as VARCHAR → the
    * engine output casts to match). */
  val a7: QueryDef = m(
    "a7_partitioned_sink",
    s"""SELECT CAST(n_regionkey AS VARCHAR) AS n_regionkey, n_nationkey, n_name
       |FROM read_parquet('$ioDir/nation_part/*/*.parquet', hive_partitioning = true)
       |ORDER BY n_nationkey""".stripMargin) { (spark, dir) =>
    Tables.nation(spark, dir)
      .write.mode("overwrite").partitionBy("n_regionkey")
      .parquet(s"$ioDir/nation_part")
    spark.read.parquet(s"$ioDir/nation_part")
      .select(col("n_regionkey").cast("string").as("n_regionkey"),
        col("n_nationkey"), col("n_name"))
      .orderBy(col("n_nationkey"))
  }

  /** §2.A7b — bucketed sink → ZERO-SHUFFLE join (the 100-TB amortization
    * play): both fact tables are written `bucketBy(8, joinKey)` +
    * `sortBy`, so every subsequent join on that key reads co-located
    * buckets and skips BOTH exchange AND sort — the shuffle is paid once
    * at write time instead of on every downstream join. PlanSpec asserts
    * the executed join really has no Exchange above either scan.
    * (`saveAsTable` with an explicit path = external table; the in-memory
    * catalog carries the bucket spec for the session.) */
  val a7b: QueryDef = m(
    "a7b_bucketed_join",
    s"""SELECT o_orderpriority, COUNT(*) AS n_items,
       |  ${graft.core.Det.oMoney(s"SUM(${graft.core.Det.oDec2("l_quantity")})")} AS sum_qty
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
    bucketedTables(spark, dir)
    val l = spark.table("graft_bkt_lineitem")
    // MERGE hint: at 100 TB neither fact side is broadcast-able, and SMJ
    // is what exploits the bucket layout; without it the tiny test-scale
    // orders side would be broadcast and the plan wouldn't demonstrate
    // the exchange-free join this query exists to pin down
    val o = spark.table("graft_bkt_orders").hint("merge")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        graft.core.Det.money(sum(graft.core.Det.dec2(col("l_quantity"))))
          .as("sum_qty"))
      .orderBy(col("o_orderpriority"))
  }

  /** Idempotent per-(session, sfDir) bucketed-table setup: re-registers
    * and rewrites only when the source scale factor changes. */
  def bucketedTables(spark: org.apache.spark.sql.SparkSession, dir: String): Unit =
    synchronized {
      val marker = java.nio.file.Paths.get(s"$ioDir/.bucketed_src")
      val current = if (java.nio.file.Files.exists(marker))
        new String(java.nio.file.Files.readAllBytes(marker)) else ""
      val fresh = current != dir ||
        !spark.catalog.tableExists("graft_bkt_lineitem")
      if (fresh) {
        spark.sql("DROP TABLE IF EXISTS graft_bkt_lineitem")
        spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
        // repartition BY THE BUCKET KEY into the bucket count before the
        // write: the sf0.1 source is one ~11 MB scan split, so without it
        // the whole sort+write ran as ONE task (guide §2 — the dissection
        // is in plans/r22/lakehouse_op_census_before.txt). repartition's
        // HashPartitioning is the same murmur3-pmod the bucket spec uses,
        // so each task holds exactly one bucket: still 8 files, one per
        // bucket, now written by 8 parallel tasks — and at 100 TB the
        // pre-distribution is what avoids the tasks×buckets small-file
        // matrix every bucketed write otherwise produces.
        Tables.lineitem(spark, dir)
          .select(col("l_orderkey"), col("l_quantity"))
          .repartition(8, col("l_orderkey"))
          .write.mode("overwrite")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$ioDir/bkt_lineitem")
          .saveAsTable("graft_bkt_lineitem")
        Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_orderpriority"))
          .repartition(8, col("o_orderkey"))
          .write.mode("overwrite")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$ioDir/bkt_orders")
          .saveAsTable("graft_bkt_orders")
        new java.io.File(ioDir).mkdirs()
        java.nio.file.Files.write(marker, dir.getBytes)
      }
    }

  /** §3.2 EP1 — a full config-driven pipeline (YAML string → source →
    * checks → quarantine split → derive/join/select → result), verified
    * against the equivalent hand-written SQL. */
  val ep1: QueryDef = m(
    "ep1_config_pipeline",
    s"""SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate, l.l_extendedprice,
       |  CAST(CAST(ROUND(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS net_price,
       |  o.o_orderpriority
       |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |WHERE l.l_discount BETWEEN 0.0 AND 0.1 AND l.l_quantity > 0
       |  AND l.l_returnflag IN ('A','N','R') AND l.l_extendedprice >= l.l_quantity
       |  AND l.l_quantity >= 10
       |ORDER BY l.l_orderkey, l.l_linenumber, l.l_shipdate, l.l_extendedprice""".stripMargin) { (spark, dir) =>
    val yaml =
      s"""name: ep1_demo
         |source: {format: parquet, path: "$dir/lineitem.parquet"}
         |checks:
         |  - {type: range, col: l_discount, lo: 0.0, hi: 0.1}
         |  - {type: cross, expr: "l_quantity > 0"}
         |  - {type: in_set, col: l_returnflag, values: [A, N, R]}
         |  - {type: cross, expr: "l_extendedprice >= l_quantity"}
         |transforms:
         |  - {op: filter, expr: "l_quantity >= 10"}
         |  - {op: derive, name: net_price,
         |     expr: "CAST(CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))), 2) AS DECIMAL(18,2)) AS DOUBLE)"}
         |  - {op: join, table: {format: parquet, path: "$dir/orders.parquet"},
         |     expr: "l_orderkey = o_orderkey", how: inner, broadcast: false}
         |  - {op: select, cols: [l_orderkey, l_linenumber, l_shipdate, l_extendedprice, net_price, o_orderpriority]}
         |  - {op: sort, cols: [l_orderkey, l_linenumber, l_shipdate, l_extendedprice]}
         |""".stripMargin
    PipelineRunner.run(spark, yaml).passed
  }

  /** §3.2 EP1b — the quarantine side AS a first-class result, with
    * failure REASONS: `failed_checks` names every check the row failed,
    * in declaration order (ADF Assert parity), read off the same fused
    * flag projection the split uses — zero extra passes. Serialized with
    * '|' for the compare (D-rule 6); DuckDB's concat_ws skips NULL CASE
    * branches exactly like array_join reads the compacted array. */
  val ep1b: QueryDef = m(
    "ep1b_config_quarantine",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_discount,
      |  concat_ws('|',
      |    CASE WHEN NOT coalesce(l_quantity <= 45, false) THEN 'qty_cap' END,
      |    CASE WHEN NOT coalesce(l_returnflag IN ('A','R'), false) THEN 'flag_ar' END,
      |    CASE WHEN NOT coalesce(l_discount <= 0.05, false) THEN 'low_disc' END) AS failed_checks
      |FROM lineitem
      |WHERE NOT (coalesce(l_quantity <= 45, false)
      |  AND coalesce(l_returnflag IN ('A','R'), false)
      |  AND coalesce(l_discount <= 0.05, false))
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (spark, dir) =>
    val yaml =
      s"""name: ep1b_quarantine
         |source: {format: parquet, path: "$dir/lineitem.parquet"}
         |checks:
         |  - {type: cross, name: qty_cap, expr: "l_quantity <= 45"}
         |  - {type: in_set, name: flag_ar, col: l_returnflag, values: [A, R]}
         |  - {type: cross, name: low_disc, expr: "l_discount <= 0.05"}
         |""".stripMargin
    PipelineRunner.run(spark, yaml).quarantined
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"), col("l_discount"),
        array_join(col("failed_checks"), "|").as("failed_checks"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** §3.2 EP2 — a config-declared pipeline ending in a GROUP BY: the
    * `aggregate` op (checks → filter → groupBy/agg → sort, all from YAML).
    * Sums run over DECIMAL(12,2) casts so accumulation order cannot
    * matter (same determinism rule as pricing_summary). */
  val ep2: QueryDef = m(
    "ep2_config_aggregate",
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
       |  CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS sum_base,
       |  COUNT(*) AS n
       |FROM lineitem
       |WHERE l_orderkey IS NOT NULL AND l_discount BETWEEN 0.0 AND 0.1
       |  AND l_quantity >= 5
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
    val yaml =
      s"""name: ep2_agg
         |source: {format: parquet, path: "$dir/lineitem.parquet"}
         |checks:
         |  - {type: not_null, col: l_orderkey}
         |  - {type: range, col: l_discount, lo: 0.0, hi: 0.1}
         |transforms:
         |  - {op: filter, expr: "l_quantity >= 5"}
         |  - {op: aggregate, cols: [l_returnflag, l_linestatus],
         |     aggs: ["CAST(CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty",
         |            "CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS sum_base",
         |            "COUNT(*) AS n"]}
         |  - {op: sort, cols: [l_returnflag, l_linestatus]}
         |""".stripMargin
    PipelineRunner.run(spark, yaml).passed
  }

  /** §3.2 EP2b — union + deterministic dedup + a window function through
    * `derive` (the OVER clause rides Spark's expression parser), all from
    * YAML: self-union doubles every customer row, dedup restores one
    * survivor per key under a total order, then top-10 per market segment
    * by a ranking window. */
  val ep2b: QueryDef = m(
    "ep2b_config_union_dedup",
    s"""WITH u AS (SELECT * FROM customer UNION ALL SELECT * FROM customer),
       |d AS (SELECT * FROM u QUALIFY row_number()
       |  OVER (PARTITION BY c_custkey ORDER BY c_acctbal, c_name, c_nationkey, c_mktsegment) = 1)
       |SELECT c_mktsegment, seg_rank, c_custkey, c_acctbal FROM (
       |  SELECT c_mktsegment,
       |    CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS seg_rank,
       |    c_custkey, c_acctbal
       |  FROM d)
       |WHERE seg_rank <= 10
       |ORDER BY c_mktsegment, seg_rank""".stripMargin) { (spark, dir) =>
    val yaml =
      s"""name: ep2b_union_dedup
         |source: {format: parquet, path: "$dir/customer.parquet"}
         |transforms:
         |  - {op: union, table: {format: parquet, path: "$dir/customer.parquet"}}
         |  - {op: dedup, cols: [c_custkey],
         |     orderBy: [c_acctbal, c_name, c_nationkey, c_mktsegment]}
         |  - {op: derive, name: seg_rank,
         |     expr: "CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS BIGINT)"}
         |  - {op: filter, expr: "seg_rank <= 10"}
         |  - {op: select, cols: [c_mktsegment, seg_rank, c_custkey, c_acctbal]}
         |  - {op: sort, cols: [c_mktsegment, seg_rank]}
         |""".stripMargin
    PipelineRunner.run(spark, yaml).passed
  }

  /** §3.2 EP3 — the SAME config vocabulary with `mode: streaming`: the
    * pipeline (checks → filter → derives → select) runs as a real
    * AvailableNow MicroBatchExecution over the events file stream, the
    * trailing sort applies to the captured result, and the whole thing is
    * oracle-checked like any batch query. */
  val ep3: QueryDef = m(
    "ep3_config_stream",
    s"""SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS event_ts,
       |  CAST(floor(value / 50) AS BIGINT) AS v_bucket, value
       |FROM events
       |WHERE event_id IS NOT NULL
       |  AND event_type IN ('click','view','purchase','signup')
       |  AND value BETWEEN 0.0 AND 400.0
       |  AND user_id % 2 = 0
       |ORDER BY event_id""".stripMargin) { (spark, dir) =>
    // `schema: auto` + a probe-chosen derive: the declared schema and the
    // event_ts expression both track the file's physical ts type (nanos
    // BIGINT vs micros timestamp), so this pipeline survives driver-side
    // data drift (the round-13 regression class).
    val tsExpr =
      if (Tables.eventsTsIsLong(spark, dir))
        "CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)"
      else "CAST(ts AS TIMESTAMP_NTZ)"
    val yaml =
      s"""name: ep3_stream
         |mode: streaming
         |source: {format: parquet, path: "$dir",
         |  schema: auto,
         |  options: {pathGlobFilter: "events.parquet"}}
         |checks:
         |  - {type: not_null, col: event_id}
         |  - {type: in_set, col: event_type, values: [click, view, purchase, signup]}
         |  - {type: range, col: value, lo: 0.0, hi: 400.0}
         |transforms:
         |  - {op: filter, expr: "user_id % 2 = 0"}
         |  - {op: derive, name: event_ts, expr: "$tsExpr"}
         |  - {op: derive, name: v_bucket, expr: "CAST(floor(value / 50) AS BIGINT)"}
         |  - {op: select, cols: [event_id, user_id, event_type, event_ts, v_bucket, value]}
         |  - {op: sort, cols: [event_id]}
         |""".stripMargin
    PipelineRunner.run(spark, yaml).passed
  }

  /** §3.2 EP3b — a STATEFUL streaming pipeline from the same YAML: the
    * `aggregate` op under `mode: streaming` becomes a streaming
    * aggregation backed by the state store, emitted in update mode.
    * The whole events file arrives in one micro-batch (AvailableNow), so
    * each group key is emitted exactly once and the captured result is
    * the complete aggregate — oracle-checked against the batch GROUP BY.
    * Sums accumulate over DECIMAL(12,2) casts so ordering cannot matter
    * (same determinism rule as ep2/pricing_summary). */
  val ep3b: QueryDef = m(
    "ep3b_config_stream_agg",
    s"""SELECT event_type, CAST(floor(value / 100) AS BIGINT) AS v_bucket,
       |  COUNT(*) AS n,
       |  CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
       |FROM events
       |WHERE event_id IS NOT NULL AND value BETWEEN 0.0 AND 400.0
       |GROUP BY event_type, CAST(floor(value / 100) AS BIGINT)
       |ORDER BY event_type, v_bucket""".stripMargin) { (spark, dir) =>
    val yaml =
      s"""name: ep3b_stream_agg
         |mode: streaming
         |output_mode: update
         |source: {format: parquet, path: "$dir",
         |  schema: auto,
         |  options: {pathGlobFilter: "events.parquet"}}
         |checks:
         |  - {type: not_null, col: event_id}
         |  - {type: range, col: value, lo: 0.0, hi: 400.0}
         |transforms:
         |  - {op: derive, name: v_bucket, expr: "CAST(floor(value / 100) AS BIGINT)"}
         |  - {op: aggregate, cols: [event_type, v_bucket],
         |     aggs: ["COUNT(*) AS n",
         |            "CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value"]}
         |  - {op: sort, cols: [event_type, v_bucket]}
         |""".stripMargin
    PipelineRunner.run(spark, yaml).passed
  }

  /** §3.2 EP4 — the native as-of join (§2.D7 / d7b) reached from the YAML
    * config surface: enrichment declared as `op: asof_join`, with the
    * right side read, filtered and renamed entirely from config. Same
    * DuckDB ASOF LEFT JOIN oracle as d7/d7b, so all three routes
    * (window form, native operator, config surface) cross-check. */
  val ep4: QueryDef = m(
    "ep4_config_asof",
    """SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS purchase_ts,
      |  CAST(v.ts AS TIMESTAMP) AS last_view_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.user_id AND v.ts <= p.ts
      |ORDER BY p.event_id""".stripMargin) { (spark, dir) =>
    // Probe-chosen NTZ derives (see ep3): the as-of ordering key `ts`
    // stays in the file's physical type on BOTH sides (AsOfJoinExec orders
    // any orderable type), only the output projections adapt.
    val ntz = (c: String) =>
      if (Tables.eventsTsIsLong(spark, dir))
        s"CAST(timestamp_micros($c div 1000) AS TIMESTAMP_NTZ)"
      else s"CAST($c AS TIMESTAMP_NTZ)"
    val yaml =
      s"""name: ep4_asof
         |source: {format: parquet, path: "$dir/events.parquet"}
         |checks:
         |  - {type: not_null, col: user_id}
         |transforms:
         |  - {op: filter, expr: "event_type = 'purchase'"}
         |  - {op: derive, name: purchase_ts, expr: "${ntz("ts")}"}
         |  - {op: select, cols: [event_id, user_id, ts, purchase_ts]}
         |  - op: asof_join
         |    table: {format: parquet, path: "$dir/events.parquet"}
         |    where: "event_type = 'view'"
         |    cols: ["user_id:v_user_id", "ts:v_ts"]
         |    on: ["user_id:v_user_id"]
         |    expr: "ts:v_ts"
         |  - {op: derive, name: last_view_ts, expr: "${ntz("v_ts")}"}
         |  - {op: select, cols: [event_id, user_id, purchase_ts, last_view_ts]}
         |  - {op: sort, cols: [event_id]}
         |""".stripMargin
    PipelineRunner.run(spark, yaml).passed
  }

  /** §3.2 EP5 — reshaping through the config surface: `pivot` (explicit
    * values — no discovery scan) then `unpivot` back to long form, with a
    * `surrogate_key` over the declared total order. Pivot∘unpivot restores
    * the long-form GROUP BY with absent (bucket, type) combinations made
    * explicit as zeros — exactly what the oracle's cross join + left join
    * computes, so the inverse-pair semantics are what's verified. */
  val ep5: QueryDef = m(
    "ep5_config_pivot",
    """WITH b AS (SELECT DISTINCT user_id % 10 AS bucket FROM events),
      |t AS (SELECT unnest(['view','click','purchase','signup','error']) AS event_type),
      |c AS (SELECT user_id % 10 AS bucket, event_type, COUNT(*) AS n
      |      FROM events GROUP BY 1, 2)
      |SELECT ROW_NUMBER() OVER (ORDER BY b.bucket, t.event_type) AS sk,
      |  b.bucket, t.event_type, COALESCE(c.n, 0) AS n
      |FROM b CROSS JOIN t
      |LEFT JOIN c ON c.bucket = b.bucket AND c.event_type = t.event_type
      |ORDER BY sk""".stripMargin) { (spark, dir) =>
    val yaml =
      s"""name: ep5_pivot
         |source: {format: parquet, path: "$dir/events.parquet"}
         |transforms:
         |  - {op: derive, name: bucket, expr: "user_id % 10"}
         |  - {op: pivot, cols: [bucket], name: event_type,
         |     values: [view, click, purchase, signup, error],
         |     aggs: ["COUNT(*)"]}
         |  - {op: unpivot, cols: [bucket],
         |     values: [view, click, purchase, signup, error],
         |     name: event_type, to: n}
         |  - {op: derive, name: n, expr: "coalesce(n, CAST(0 AS BIGINT))"}
         |  - {op: surrogate_key, name: sk, orderBy: [bucket, event_type], max_rows: 1000}
         |  - {op: select, cols: [sk, bucket, event_type, n]}
         |  - {op: sort, cols: [sk]}
         |""".stripMargin
    PipelineRunner.run(spark, yaml).passed
  }

  /** §3.2 EP5b — positional `flatten` through the config surface: derive a
    * token array, explode it with position (§2.B7's posexplode), all from
    * YAML. */
  val ep5b: QueryDef = m(
    "ep5b_config_flatten",
    """SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS tok
      |FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
      |      FROM documents WHERE doc_id < 50)
      |ORDER BY doc_id, pos""".stripMargin) { (spark, dir) =>
    val yaml =
      s"""name: ep5b_flatten
         |source: {format: parquet, path: "$dir/documents.parquet"}
         |transforms:
         |  - {op: filter, expr: "doc_id < 50"}
         |  - {op: derive, name: toks, expr: "split(lower(text), ' ')"}
         |  - {op: select, cols: [doc_id, toks]}
         |  - {op: flatten, cols: [toks], name: tok, to: pos}
         |  - {op: derive, name: pos, expr: "CAST(pos AS BIGINT)"}
         |  - {op: select, cols: [doc_id, pos, tok]}
         |  - {op: sort, cols: [doc_id, pos]}
         |""".stripMargin
    PipelineRunner.run(spark, yaml).passed
  }

  /** §3.2 EP6 — CDC-style `merge` (upsert) through the config surface:
    * the engine first writes a deterministic change set (10 region
    * reassignments + 3 brand-new nations), then a YAML pipeline merges it
    * into the nation base on the key — updates replace, inserts append,
    * untouched rows survive. Oracle is the equivalent anti-join + union
    * over the same two parquet inputs.
    *
    * The base is NATION on purpose: it is sf-INVARIANT, so the shared
    * `$ioDir/nation_updates` artifact is identical no matter which scale
    * factor last wrote it (Bench at sf0.1 runs between Verify at sf0.01
    * and the oracle read — a customer-based change set flipped values
    * with the run order; same rule as a3/a4/a7's round-trip fixtures). */
  val ep6: QueryDef = m(
    "ep6_config_merge",
    s"""WITH u AS (SELECT * FROM read_parquet('$ioDir/nation_updates/*.parquet'))
       |SELECT n_nationkey, n_name, n_regionkey FROM u
       |UNION ALL
       |SELECT b.n_nationkey, b.n_name, b.n_regionkey FROM nation b
       |WHERE NOT EXISTS (SELECT 1 FROM u WHERE u.n_nationkey = b.n_nationkey)
       |ORDER BY n_nationkey""".stripMargin) { (spark, dir) =>
    val base = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    base.where(col("n_nationkey") <= 10)
      .withColumn("n_regionkey", col("n_regionkey") + 100)
      .unionByName(base.where(col("n_nationkey") <= 2)
        .withColumn("n_nationkey", col("n_nationkey") + 1000)
        .withColumn("n_name", concat(lit("NEW_"), col("n_name"))))
      .coalesce(1).write.mode("overwrite").parquet(s"$ioDir/nation_updates")
    val yaml =
      s"""name: ep6_merge
         |source: {format: parquet, path: "$dir/nation.parquet"}
         |transforms:
         |  - {op: select, cols: [n_nationkey, n_name, n_regionkey]}
         |  - {op: merge, on: [n_nationkey],
         |     table: {format: parquet, path: "$ioDir/nation_updates"}}
         |  - {op: sort, cols: [n_nationkey]}
         |""".stripMargin
    PipelineRunner.run(spark, yaml).passed
  }

  /** §3.2 EP7 — the LLM-data-pipeline dedup endgame declared ENTIRELY in
    * YAML: tokenize → minhash_dedup → project → sort. threshold 1.0 keeps
    * one survivor per identical-token-SET group, which is oracle-exact at
    * any scale: identical sets share ALL minhash signatures, so every
    * such pair is an LSH candidate by construction (SimilarityOpsSpec's
    * exact-dup law), the Jaccard-1.0 verify keeps exactly those edges,
    * and the components are the set-equality classes — DuckDB computes
    * the same survivors with one window over the normalized token set.
    * (Sub-1.0 thresholds ride the identical machinery; their LSH recall
    * story is k12b's, spec-checked rather than oracle-checked.) */
  val ep7: QueryDef = m(
    "ep7_config_textdedup",
    """SELECT doc_id, lang, source, n_chars FROM documents
      |QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY
      |  to_json(list_sort(list_distinct(string_split(lower(text), ' ')))))
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val yaml =
      s"""name: ep7_textdedup
         |source: {format: parquet, path: "$dir/documents.parquet"}
         |transforms:
         |  - {op: tokenize, cols: [text], name: toks}
         |  - {op: minhash_dedup, cols: [doc_id, toks], threshold: 1.0}
         |  - {op: select, cols: [doc_id, lang, source, n_chars]}
         |  - {op: sort, cols: [doc_id]}
         |""".stripMargin
    PipelineRunner.run(spark, yaml).passed
  }

  /** §3.2 EP7b — TF-IDF scoring from the YAML surface: tokenize → tfidf
    * (a RESHAPING op: the frame becomes (doc_id, term, tf, score)) —
    * same oracle as j5, so the config route cross-checks the direct one. */
  val ep7b: QueryDef = m(
    "ep7b_config_tfidf",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
      |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
      |n AS (SELECT COUNT(*) AS n FROM documents)
      |SELECT tf.doc_id, tf.term, tf.tf,
      |  ROUND(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS score
      |FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
      |ORDER BY tf.doc_id, tf.term""".stripMargin) { (spark, dir) =>
    val yaml =
      s"""name: ep7b_tfidf
         |source: {format: parquet, path: "$dir/documents.parquet"}
         |transforms:
         |  - {op: tokenize, cols: [text], name: toks}
         |  - {op: tfidf, cols: [doc_id, toks]}
         |  - {op: sort, cols: [doc_id, term]}
         |""".stripMargin
    PipelineRunner.run(spark, yaml).passed
  }

  /** §3.2 EP8 — similarity search from the YAML surface: `ann_topk`
    * broadcasts the declared query row's vector and plans the top-k as
    * TakeOrderedAndProject (same oracle shape as k4 — rank with id
    * tiebreak, never bare LIMIT over ties). */
  val ep8: QueryDef = m(
    "ep8_config_ann",
    """SELECT vec_id, cos_sim FROM (
      |  SELECT v.vec_id,
      |    ROUND(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
      |                                 CAST(q.embedding AS DOUBLE[])), 6) AS cos_sim
      |  FROM embeddings v
      |  CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
      |  WHERE v.vec_id <> 0)
      |ORDER BY cos_sim DESC, vec_id LIMIT 20""".stripMargin) { (spark, dir) =>
    val yaml =
      s"""name: ep8_ann
         |source: {format: parquet, path: "$dir/embeddings.parquet"}
         |transforms:
         |  - {op: ann_topk, cols: [vec_id, embedding], where: "vec_id = 0", k: 20}
         |""".stripMargin
    PipelineRunner.run(spark, yaml).passed
  }

  /** §3.2 EP9 — incremental (high-water-mark) ingestion, ADF's
    * incremental-copy pattern: the source declares `incremental`
    * {watermark_col, state_path}; rows at or below the persisted mark are
    * skipped by a pushed-down comparison, and the runner advances the
    * mark past the rows it read. The query pins a deterministic mark
    * first (idempotent re-runs — the post-run advance is overwritten next
    * build), so the oracle is the equivalent static filter. The two-run
    * catch-up semantics (second run sees only NEW rows) are
    * ConfigPipelineSpec territory. */
  val ep9: QueryDef = m(
    "ep9_config_incremental",
    """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
      |WHERE o_orderdate > DATE '1997-06-30'
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    graft.config.IncrementalState.write(s"$ioDir/ep9_state.json", "1997-06-30", "DATE")
    val yaml =
      s"""name: ep9_incremental
         |source: {format: parquet, path: "$dir/orders.parquet",
         |  incremental: {watermark_col: o_orderdate, state_path: "$ioDir/ep9_state.json"}}
         |transforms:
         |  - {op: select, cols: [o_orderkey, o_orderdate, o_totalprice]}
         |  - {op: sort, cols: [o_orderkey]}
         |""".stripMargin
    PipelineRunner.run(spark, yaml).passed
  }

  /** Writes a DataFrame as ONE parquet file at an exact path (schema-
    * evolution fixtures need multiple distinct-schema files in one dir). */
  def writeSingleParquet(df: org.apache.spark.sql.DataFrame, dest: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    val tmp = dest + "_tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = scala.util.Using.resource(Files.list(Paths.get(tmp)))(
      _.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get)
    Files.createDirectories(Paths.get(dest).getParent)
    Files.move(part, Paths.get(dest), StandardCopyOption.REPLACE_EXISTING)
    graft.streaming.StreamOps.rmrf(tmp)
  }

  /** §3.2 EP10 — schema drift policy `allow`: the source dir holds a v1
    * file (id, name) and an upstream-evolved v2 file (+score, +extra);
    * the declared schema says (id, name, score), so the read merges the
    * files, fills v1's missing score with typed nulls, and DROPS the
    * undeclared extra — downstream ops never see a surprise column.
    * Oracle: DuckDB union_by_name over the same two files. The fixture is
    * constant content (sf-invariant, same rule as a3/a4's round-trips).
    * `strict` (the fail-fast half) is ConfigPipelineSpec territory —
    * an error path has no result to oracle-check. */
  val ep10: QueryDef = m(
    "ep10_config_drift",
    s"""SELECT id, name, score
       |FROM read_parquet('$ioDir/drift_src/*.parquet', union_by_name = true)
       |ORDER BY id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    writeSingleParquet(Seq((1L, "a"), (2L, "b")).toDF("id", "name"),
      s"$ioDir/drift_src/v1.parquet")
    writeSingleParquet(
      Seq((3L, "c", 1.5, "x"), (4L, "d", 2.5, "y"))
        .toDF("id", "name", "score", "extra"),
      s"$ioDir/drift_src/v2.parquet")
    val yaml =
      s"""name: ep10_drift
         |source: {format: parquet, path: "$ioDir/drift_src",
         |  schema: "id BIGINT, name STRING, score DOUBLE", drift: allow}
         |transforms:
         |  - {op: sort, cols: [id]}
         |""".stripMargin
    PipelineRunner.run(spark, yaml).passed
  }

  /** §3.2 EP11 — sequence packing from the YAML surface (same oracle as
    * j11, so the config route cross-checks the direct one). */
  val ep11: QueryDef = m(
    "ep11_config_pack",
    """SELECT doc_id, shard, n_tokens,
      |  CAST(shard * 1000000 + (cum_tokens - n_tokens) // 4096 AS BIGINT) AS pack_id
      |FROM (
      |  SELECT doc_id, doc_id % 8 AS shard,
      |    len(string_split(text, ' ')) AS n_tokens,
      |    SUM(len(string_split(text, ' '))) OVER (
      |      PARTITION BY doc_id % 8 ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val yaml =
      s"""name: ep11_pack
         |source: {format: parquet, path: "$dir/documents.parquet"}
         |transforms:
         |  - {op: derive, name: shard, expr: "doc_id % 8"}
         |  - {op: derive, name: n_tokens, expr: "CAST(size(split(text, ' ')) AS BIGINT)"}
         |  - {op: pack, cols: [shard, doc_id], expr: "n_tokens", k: 4096}
         |  - {op: select, cols: [doc_id, shard, n_tokens, pack_id]}
         |  - {op: sort, cols: [doc_id]}
         |""".stripMargin
    PipelineRunner.run(spark, yaml).passed
  }

  /** §3.2 EP12 — seeded stratified sampling from the YAML surface
    * (X-tier: Spark's Bernoulli sampler is engine-specific, same as
    * e10/e10b; ConfigPipelineSpec owns the seed-stability and
    * keep-stratum laws). */
  val ep12: QueryDef = x("ep12_config_sample") { (spark, dir) =>
    val yaml =
      s"""name: ep12_sample
         |source: {format: parquet, path: "$dir/events.parquet"}
         |transforms:
         |  - {op: sample, cols: [event_type], seed: 42,
         |     values: ["purchase:1.0", "signup:1.0", "view:0.05"], fraction: 0.2}
         |  - {op: aggregate, cols: [event_type], aggs: ["COUNT(*) AS n"]}
         |  - {op: sort, cols: [event_type]}
         |""".stripMargin
    PipelineRunner.run(spark, yaml).passed
  }

  /** §3.2 EP13 — corpus curation gates from YAML: repetition-based
    * quality filter (§2.J13) then benchmark decontamination (§2.J12),
    * declared in config alone. The benchmark is the lowest 20 doc_ids
    * (filtered via the op's `where`); corpus rows at or under the
    * 0.55 duplicate-word bar AND sharing no verbatim 5-gram with the
    * benchmark survive. Oracle: the same two gates as DuckDB CTEs. */
  val ep13: QueryDef = m(
    "ep13_config_curate",
    """WITH d AS (SELECT doc_id, lang, source, n_chars,
      |    string_split(lower(text), ' ') AS toks FROM documents),
      |q AS (SELECT * FROM d WHERE doc_id >= 20 AND len(toks) > 0
      |  AND 1 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) <= 0.55),
      |bench AS (SELECT DISTINCT unnest(list_transform(range(1, len(toks) - 5 + 2),
      |    i -> array_to_string(list_slice(toks, i, i + 4), ' '))) AS g
      |  FROM d WHERE doc_id < 20),
      |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 5 + 2),
      |    i -> array_to_string(list_slice(toks, i, i + 4), ' '))) AS g FROM q),
      |contaminated AS (SELECT DISTINCT s.doc_id FROM sh s JOIN bench b ON s.g = b.g)
      |SELECT doc_id, lang, source, n_chars FROM q
      |WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val yaml =
      s"""name: ep13_curate
         |source: {format: parquet, path: "$dir/documents.parquet"}
         |transforms:
         |  - {op: tokenize, cols: [text], name: toks}
         |  - {op: filter, expr: "doc_id >= 20"}
         |  - {op: quality_filter, cols: [toks], threshold: 0.55}
         |  - {op: decontaminate, cols: [doc_id, toks], k: 5, where: "doc_id < 20",
         |     table: {format: parquet, path: "$dir/documents.parquet"}}
         |  - {op: select, cols: [doc_id, lang, source, n_chars]}
         |  - {op: sort, cols: [doc_id]}
         |""".stripMargin
    PipelineRunner.run(spark, yaml).passed
  }

  /** §3.2 EP14 — branched (DAG) pipeline: one declared source feeds the
    * main curated sink AND a per-language aggregate side sink (ADF "new
    * branch" parity). The query returns the branch's published output
    * read back from its sink — so the fork, the branch transforms, AND
    * the sink write are all on the verified path. */
  val ep14: QueryDef = m(
    "ep14_config_branches",
    """SELECT lang, COUNT(*) AS n_docs FROM documents
      |GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
    val out = s"$ioDir/ep14_branches"
    val yaml =
      s"""name: ep14_branches
         |source: {format: parquet, path: "$dir/documents.parquet"}
         |transforms:
         |  - {op: select, cols: [doc_id, n_chars]}
         |sink: {format: parquet, path: "$out/main", mode: overwrite}
         |branches:
         |  - name: per_lang
         |    transforms:
         |      - {op: aggregate, cols: [lang], aggs: ["COUNT(*) AS n_docs"]}
         |      - {op: sort, cols: [lang]}
         |    sink: {format: parquet, path: "$out/per_lang", mode: overwrite}
         |""".stripMargin
    PipelineRunner.run(spark, yaml)
    spark.read.parquet(s"$out/per_lang").orderBy(col("lang"))
  }

  /** §3.2 EP15 — SemDeDup (§2.K11) from the YAML surface, in TAG mode:
    * every vector keeps its semantic-cluster label (`name: cluster_id`),
    * then config-level `derive` marks survivors. Same oracle semantics
    * as k11 (the op's "k smallest ids" centroid contract equals k11's
    * `vec_id < 16` on this dense-id corpus), so the config route
    * cross-checks the direct one end-to-end — assignment argmax,
    * within-cell threshold join, and closure all replayed by DuckDB. */
  val ep15: QueryDef = m(
    "ep15_config_semdedup",
    """WITH RECURSIVE v AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |cents AS (SELECT vec_id AS cid, e AS c FROM v WHERE vec_id < 16),
      |assign AS (
      |  SELECT vec_id, e, cid AS cell FROM (
      |    SELECT v.vec_id, v.e, c.cid,
      |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
      |        ORDER BY ROUND(list_cosine_similarity(v.e, c.c), 6) DESC, c.cid DESC) AS rn
      |    FROM v CROSS JOIN cents c) WHERE rn = 1),
      |pairs AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
      |  WHERE ROUND(list_cosine_similarity(a.e, b.e), 6) >= 0.35),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |          UNION SELECT id_b, id_a FROM pairs),
      |reach(src, dst) AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      |comp AS (SELECT src AS vec_id, LEAST(src, MIN(dst)) AS cluster_id
      |         FROM reach GROUP BY src)
      |SELECT a.vec_id, COALESCE(c.cluster_id, a.vec_id) AS cluster_id,
      |  a.vec_id = COALESCE(c.cluster_id, a.vec_id) AS is_survivor
      |FROM assign a LEFT JOIN comp c ON a.vec_id = c.vec_id
      |ORDER BY a.vec_id""".stripMargin) { (spark, dir) =>
    val yaml =
      s"""name: ep15_semdedup
         |source: {format: parquet, path: "$dir/embeddings.parquet"}
         |transforms:
         |  - {op: semdedup, cols: [vec_id, embedding], threshold: 0.35, k: 16,
         |     name: cluster_id}
         |  - {op: derive, name: is_survivor, expr: "vec_id = cluster_id"}
         |  - {op: select, cols: [vec_id, cluster_id, is_survivor]}
         |  - {op: sort, cols: [vec_id]}
         |""".stripMargin
    PipelineRunner.run(spark, yaml).passed
  }

  /** §3.2 EP16 — SCD2 merge (effective-dated history) from the YAML
    * surface. The engine first writes two sf-invariant artifacts (same
    * nation-based determinism rule as ep6): an SCD base where every
    * nation is a current version and keys ≤ 5 also carry a closed 2023
    * version, and a change set with three populations — keys ≤ 10 move
    * region (attribute change → close-out + new version), keys 11–13
    * arrive UNCHANGED (classic SCD2 no-ops — nothing versions), and
    * three unseen keys insert as new current rows. The oracle replays
    * the same semantics as one DuckDB query over the two artifacts:
    * current × changes left join with null-safe attribute comparison,
    * then history ∪ no-ops ∪ close-outs ∪ new versions ∪ inserts. */
  val ep16: QueryDef = m(
    "ep16_config_scd2",
    s"""WITH b AS (SELECT * FROM read_parquet('$ioDir/nation_scd_base/*.parquet')),
       |u AS (SELECT * FROM read_parquet('$ioDir/nation_scd_changes/*.parquet')),
       |cur AS (SELECT * FROM b WHERE is_current),
       |hist AS (SELECT * FROM b WHERE NOT is_current),
       |m AS (
       |  SELECT c.n_nationkey, c.n_name, c.n_regionkey, c.valid_from,
       |         c.valid_to, c.is_current, u.n_name AS un, u.n_regionkey AS ur,
       |         u.eff_date,
       |         u.n_nationkey IS NOT NULL AND (
       |           c.n_name IS DISTINCT FROM u.n_name OR
       |           c.n_regionkey IS DISTINCT FROM u.n_regionkey) AS versioned
       |  FROM cur c LEFT JOIN u ON c.n_nationkey = u.n_nationkey)
       |SELECT n_nationkey, n_name, n_regionkey, valid_from, valid_to, is_current
       |FROM hist
       |UNION ALL
       |SELECT n_nationkey, n_name, n_regionkey, valid_from, valid_to, is_current
       |FROM m WHERE NOT versioned
       |UNION ALL
       |SELECT n_nationkey, n_name, n_regionkey, valid_from, eff_date, FALSE
       |FROM m WHERE versioned
       |UNION ALL
       |SELECT n_nationkey, un, ur, eff_date, NULL, TRUE FROM m WHERE versioned
       |UNION ALL
       |SELECT u.n_nationkey, u.n_name, u.n_regionkey, u.eff_date, NULL, TRUE
       |FROM u WHERE NOT EXISTS (
       |  SELECT 1 FROM cur c WHERE c.n_nationkey = u.n_nationkey)
       |ORDER BY n_nationkey, valid_from""".stripMargin) { (spark, dir) =>
    val base = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val d = (s: String) => lit(java.sql.Date.valueOf(s))
    base.select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
        d("2024-01-01").as("valid_from"),
        lit(null).cast("date").as("valid_to"), lit(true).as("is_current"))
      .unionByName(base.where(col("n_nationkey") <= 5)
        .select(col("n_nationkey"), col("n_name"),
          (col("n_regionkey") + 50).as("n_regionkey"),
          d("2023-01-01").as("valid_from"),
          d("2024-01-01").as("valid_to"), lit(false).as("is_current")))
      .coalesce(1).write.mode("overwrite").parquet(s"$ioDir/nation_scd_base")
    base.where(col("n_nationkey") <= 10)
      .withColumn("n_regionkey", col("n_regionkey") + 100)
      .unionByName(base.where(col("n_nationkey").between(11, 13)))
      .unionByName(base.where(col("n_nationkey") <= 2)
        .withColumn("n_nationkey", col("n_nationkey") + 1000)
        .withColumn("n_name", concat(lit("NEW_"), col("n_name"))))
      .withColumn("eff_date", d("2025-06-01"))
      .coalesce(1).write.mode("overwrite").parquet(s"$ioDir/nation_scd_changes")
    val yaml =
      s"""name: ep16_scd2
         |source: {format: parquet, path: "$ioDir/nation_scd_base"}
         |transforms:
         |  - {op: merge, how: scd2, on: [n_nationkey], expr: eff_date,
         |     table: {format: parquet, path: "$ioDir/nation_scd_changes"}}
         |  - {op: sort, cols: [n_nationkey, valid_from]}
         |""".stripMargin
    PipelineRunner.run(spark, yaml).passed
  }

  /** Compaction as a declared sink property (`files: n`) — the
    * operational fix for small-file sprawl, the #1 silent performance
    * killer of long-lived ingest tables (every micro-batch / incremental
    * run appends a few rows → thousands of KB-sized files → scan planning
    * and footer reads dominate). The pipeline reads a deliberately
    * fragmented copy of lineitem (64 shards), filters, and commits
    * exactly 3 output files via a shuffle-free coalesce at write time.
    * The oracle ignores layout entirely — content must equal the same
    * filter over the original lineitem, proving compaction is purely
    * physical. CompactionSpec asserts the file count. */
  val ep17: QueryDef = m(
    "ep17_config_compact",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem WHERE l_quantity >= 45
      |ORDER BY l_orderkey, l_linenumber, l_extendedprice""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
      .repartition(64) // simulate incremental-ingest fragmentation
      .write.mode("overwrite").parquet(s"$ioDir/lineitem_frag")
    PipelineRunner.run(spark,
      s"""name: ep17_compact
         |source: {format: parquet, path: "$ioDir/lineitem_frag"}
         |transforms:
         |  - {op: filter, expr: "l_quantity >= 45"}
         |sink: {format: parquet, path: "$ioDir/lineitem_compact", files: 3}
         |""".stripMargin)
    // read back from the COMMITTED sink — the check covers what a
    // downstream consumer actually sees, not the in-flight frame
    spark.read.parquet(s"$ioDir/lineitem_compact")
      // (l_orderkey, l_linenumber) is not unique in the synthetic corpus —
      // extendedprice completes a total order for the row-ordered compare
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
  }

  /** Driver-visible run of the `mix` op (declared-mixture domain
    * reweighting — see PipelineRunner). X-tier like every seeded-sampling
    * query (e10/ep12): Bernoulli sampleBy draws are engine-specific, so
    * no cross-engine oracle exists by construction; the semantics
    * (binding domain kept whole, proportions within tolerance, seed
    * stability, fail-fast guards) are spec'd in ConfigPipelineSpec. */
  val ep18: QueryDef = x("ep18_config_mix") { (spark, dir) =>
    PipelineRunner.run(spark,
      s"""name: ep18_mix
         |source: {format: parquet, path: "$dir/documents.parquet"}
         |transforms:
         |  - {op: mix, cols: [lang], values: ["en:0.5", "de:0.25", "fr:0.25"],
         |     seed: 42}
         |  - {op: sort, cols: [doc_id]}
         |""".stripMargin).passed
  }

  /** CDC snapshot diff through the config surface (`op: diff` — see
    * PipelineRunner): two deterministic snapshots of orders land as
    * parquet artifacts, the pipeline reads the OLD one and diffs the NEW
    * one against it, and the emitted change stream (new values +
    * `change` marker — exactly what `merge`/`scd2` consume) is
    * oracle-replayed by DuckDB's FULL JOIN over the same construction.
    * Completes the snapshot-to-incremental story: upstreams that can
    * only export full snapshots feed `diff`, whose output feeds the
    * merge family. */
  val ep19: QueryDef = m(
    "ep19_config_diff",
    """WITH o AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
      |prev AS (SELECT * FROM o WHERE o_orderkey % 10 < 9),
      |nxt AS (SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1000.0
      |         ELSE o_totalprice END AS o_totalprice,
      |    o_orderstatus
      |  FROM o WHERE o_orderkey % 10 > 0)
      |SELECT * FROM (
      |  SELECT COALESCE(nxt.o_orderkey, prev.o_orderkey) AS o_orderkey,
      |    nxt.o_totalprice AS o_totalprice,
      |    nxt.o_orderstatus AS o_orderstatus,
      |    CASE WHEN prev.o_orderkey IS NULL THEN 'insert'
      |         WHEN nxt.o_orderkey IS NULL THEN 'delete'
      |         WHEN (prev.o_totalprice IS DISTINCT FROM nxt.o_totalprice)
      |           OR (prev.o_orderstatus IS DISTINCT FROM nxt.o_orderstatus)
      |           THEN 'update' END AS change
      |  FROM prev FULL JOIN nxt ON prev.o_orderkey = nxt.o_orderkey)
      |WHERE change IS NOT NULL
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    o.where(col("o_orderkey") % 10 < 9)
      .write.mode("overwrite").parquet(s"$ioDir/snap_prev")
    o.where(col("o_orderkey") % 10 > 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1000.0)
          .otherwise(col("o_totalprice")).as("o_totalprice"),
        col("o_orderstatus"))
      .write.mode("overwrite").parquet(s"$ioDir/snap_next")
    PipelineRunner.run(spark,
      s"""name: ep19_diff
         |source: {format: parquet, path: "$ioDir/snap_prev"}
         |transforms:
         |  - {op: diff, on: [o_orderkey],
         |     table: {format: parquet, path: "$ioDir/snap_next"}}
         |  - {op: sort, cols: [o_orderkey]}
         |""".stripMargin).passed
  }

  /** ACID commit-log table (graft.tables.GraftTable) end-to-end through
    * the config surface: pipeline 1 publishes orders as a graft_table
    * (version 1), pipeline 2 MERGEs a deterministic change set — updates
    * for keys %13, inserts above the key space — rewriting only the
    * files that contain matched keys (version 2). The result reads BOTH
    * versions back (latest + `versionAsOf: 1` time travel), tagged, and
    * DuckDB replays the same upsert algebraically — so atomic commit,
    * snapshot isolation, time travel, and merge correctness are all
    * oracle-checked in one query. GraftTableSpec covers the
    * crash/concurrency laws the oracle can't see. */
  val ep20: QueryDef = m(
    "ep20_config_acid_merge",
    """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      |upd AS (
      |  SELECT o_orderkey, 'U' AS o_orderstatus,
      |         o_totalprice + 5000.0 AS o_totalprice
      |  FROM base WHERE o_orderkey % 13 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 1000000000, 'N', 1.0
      |  FROM base WHERE o_orderkey % 100 = 0),
      |v2 AS (
      |  SELECT * FROM base
      |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
      |  UNION ALL SELECT * FROM upd)
      |SELECT * FROM (
      |  SELECT 1 AS version, * FROM base WHERE o_orderkey % 4 = 0
      |  UNION ALL
      |  SELECT 2 AS version, * FROM v2 WHERE o_orderkey % 4 = 0)
      |ORDER BY version, o_orderkey""".stripMargin) { (spark, dir) =>
    val root = s"$ioDir/acid_orders"
    // deterministic version numbering run-to-run: start from a fresh log
    val rootPath = new org.apache.hadoop.fs.Path(root)
    rootPath.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(rootPath, true)
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    base.write.mode("overwrite").parquet(s"$ioDir/acid_src")
    PipelineRunner.run(spark,
      s"""name: ep20_publish
         |source: {format: parquet, path: "$ioDir/acid_src"}
         |sink: {format: graft_table, path: "$root", mode: overwrite}
         |""".stripMargin)
    base.where(col("o_orderkey") % 13 === 0)
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
        (col("o_totalprice") + 5000.0).as("o_totalprice"))
      .unionByName(base.where(col("o_orderkey") % 100 === 0)
        .select((col("o_orderkey") + 1000000000L).as("o_orderkey"),
          lit("N").as("o_orderstatus"), lit(1.0).as("o_totalprice")))
      .write.mode("overwrite").parquet(s"$ioDir/acid_upd")
    PipelineRunner.run(spark,
      s"""name: ep20_merge
         |source: {format: parquet, path: "$ioDir/acid_upd"}
         |sink: {format: graft_table, path: "$root", mode: merge,
         |       options: {on: o_orderkey}}
         |""".stripMargin)
    def readV(v: Int) = PipelineRunner.run(spark,
      s"""name: ep20_read_v$v
         |source: {format: graft_table, path: "$root",
         |         options: {versionAsOf: "$v"}}
         |transforms:
         |  - {op: filter, expr: "o_orderkey % 4 = 0"}
         |  - {op: derive, name: version, expr: "$v"}
         |  - {op: select, cols: [version, o_orderkey, o_orderstatus, o_totalprice]}
         |""".stripMargin).passed
    readV(1).unionByName(readV(2))
      .orderBy(col("version"), col("o_orderkey"))
  }

  /** EP21 — graft_table OPTIMIZE: bin-pack a fragmented ingest table
    * (per-batch ACID appends leave one small file set per batch — the
    * 100 TB metadata/open() storm) into few Z-ORDERED files as one
    * layout-only version. The oracle proves content invariance — the
    * optimized table reads back exactly the source rows — while
    * GraftTableSpec pins the physical claims (file count, both-dimension
    * per-file bounds, old-version time travel intact). */
  val ep21: QueryDef = m(
    "ep21_graft_optimize",
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    val root = s"$ioDir/acid_opt"
    val rootPath = new org.apache.hadoop.fs.Path(root)
    rootPath.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(rootPath, true)
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    // fragment like a micro-batched ingest: four ACID appends
    (0 until 4).foreach { i =>
      graft.tables.GraftTable.write(spark,
        base.where(col("o_orderkey") % 4 === i), root,
        if (i == 0) "overwrite" else "append")
    }
    graft.tables.GraftTable.optimize(spark, root, targetFiles = 4,
      zorderBy = Seq("o_custkey", "o_totalprice"))
    graft.tables.GraftTable.read(spark, root).orderBy(col("o_orderkey"))
  }

  /** EP22 — graft_table CHANGE FEED: incremental rows-added reads across
    * versions (`options.changesFrom/changesTo`), each row stamped with
    * `_commit_version`. The decisive property the oracle pins: an
    * OPTIMIZE between two feed reads is INVISIBLE — its adds carry
    * `dataChange: false` and are skipped, so compaction cannot
    * re-deliver the whole table to downstream consumers. Composes with
    * the ep9 persisted-watermark machinery (persist the last-read
    * version, pass it back as changesFrom next run) for exactly-once
    * downstream ingest without a streaming runtime. */
  val ep22: QueryDef = m(
    "ep22_graft_change_feed",
    """SELECT o_orderkey, o_totalprice, version FROM (
      |  SELECT o_orderkey, o_totalprice, CAST(2 AS BIGINT) AS version
      |  FROM orders WHERE o_orderkey % 3 = 1
      |  UNION ALL
      |  SELECT o_orderkey, o_totalprice, CAST(4 AS BIGINT) AS version
      |  FROM orders WHERE o_orderkey % 3 = 2)
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    val root = s"$ioDir/acid_feed"
    val rootPath = new org.apache.hadoop.fs.Path(root)
    rootPath.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(rootPath, true)
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
    def slice(r: Int) = base.where(col("o_orderkey") % 3 === r)
    graft.tables.GraftTable.write(spark, slice(0), root, "overwrite") // v1
    graft.tables.GraftTable.write(spark, slice(1), root, "append")    // v2
    graft.tables.GraftTable.optimize(spark, root, targetFiles = 2)    // v3: layout-only
    graft.tables.GraftTable.write(spark, slice(2), root, "append")    // v4
    PipelineRunner.run(spark,
      s"""name: ep22_feed
         |source: {format: graft_table, path: "$root", options: {changesFrom: "1"}}
         |transforms:
         |  - {op: derive, name: version, expr: "CAST(_commit_version AS BIGINT)"}
         |  - {op: select, cols: [o_orderkey, o_totalprice, version]}
         |  - {op: sort, cols: [o_orderkey]}
         |""".stripMargin).passed
  }

  /** EP23 — gap-based sessionization from YAML (the ev1 shape as a
    * declared transform): derive exact epoch-micros, `sessionize` stamps
    * the per-user session sequence, the rollup summarizes each session.
    * The window pair + rollup share one exchange on user_id (ev1's plan).
    * Oracle replays the identical lag → flag → running-sum election. */
  val ep23: QueryDef = m(
    "ep23_config_sessionize",
    """WITH g AS (
      |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS tsn,
      |    CASE WHEN epoch_ns(ts) // 1000 - lag(epoch_ns(ts) // 1000) OVER
      |           (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id)
      |         IS NULL THEN 1
      |         WHEN epoch_ns(ts) // 1000 - lag(epoch_ns(ts) // 1000) OVER
      |           (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id)
      |           > 1800000000 THEN 1 ELSE 0 END AS is_start
      |  FROM events
      |), s AS (
      |  SELECT user_id, tsn, CAST(SUM(is_start) OVER (PARTITION BY user_id
      |    ORDER BY tsn, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS session_seq
      |  FROM g
      |)
      |SELECT user_id, session_seq, count(*) AS n_events,
      |  (max(tsn) - min(tsn)) // 1000 AS duration_ms
      |FROM s GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin) { (spark, dir) =>
    val tsn = // exact epoch micros under either physical ts type
      if (Tables.eventsTsIsLong(spark, dir)) "ts div 1000"
      else "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    PipelineRunner.run(spark,
      s"""name: ep23_sessionize
         |source: {format: parquet, path: "$dir/events.parquet"}
         |transforms:
         |  - {op: derive, name: tsn, expr: "$tsn"}
         |  - {op: sessionize, on: [user_id], cols: [tsn, event_id],
         |     threshold: 1800000000, name: session_seq}
         |  - {op: aggregate, cols: [user_id, session_seq],
         |     aggs: ["COUNT(*) AS n_events",
         |            "(MAX(tsn) - MIN(tsn)) div 1000 AS duration_ms"]}
         |  - {op: sort, cols: [user_id, session_seq]}
         |""".stripMargin).passed
  }

  /** EP24 — incrementally-maintained materialized aggregate over the
    * ACID table's change feed (tables/MaterializedView): the MV advances
    * through create → incremental merge (append-only delta, O(|MV|+|Δ|))
    * → automatic full recompute (a base MERGE rewrote rows the feed
    * cannot retract) → incremental again, its consumed-base-version
    * cursor riding each MV commit as a txn action (exactly-once). The
    * oracle replays the FINAL base state's aggregate from scratch — so
    * the checked claim is "four maintenance paths land on exactly the
    * full-recompute answer". */
  val ep24: QueryDef = m(
    "ep24_graft_mv_refresh",
    """WITH b AS (
      |  SELECT o_orderstatus, o_totalprice * 2 AS p
      |  FROM orders WHERE o_orderkey % 3 = 0
      |  UNION ALL
      |  SELECT o_orderstatus, o_totalprice AS p
      |  FROM orders WHERE o_orderkey % 3 <> 0)
      |SELECT o_orderstatus, count(*) AS n,
      |  CAST(SUM(CAST(p AS DECIMAL(12,2))) AS DOUBLE) AS sum_v
      |FROM b GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
    import graft.tables.{GraftTable, MaterializedView}
    val base = s"$ioDir/mv_base_q"; val mv = s"$ioDir/mv_agg_q"
    Seq(base, mv).foreach { r =>
      val p = new org.apache.hadoop.fs.Path(r)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
    val keys = Seq("o_orderstatus")
    val aggs = Seq(
      MaterializedView.AggSpec("count", "o_orderkey", "n"),
      MaterializedView.AggSpec("sum",
        "CAST(o_totalprice AS DECIMAL(12,2))", "sum_v"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    def slice(r: Int) = o.where(col("o_orderkey") % 3 === r)
    GraftTable.write(spark, slice(0), base, "overwrite")              // v1
    MaterializedView.refresh(spark, base, mv, keys, aggs)             // create
    GraftTable.write(spark, slice(1), base, "append")                 // v2
    MaterializedView.refresh(spark, base, mv, keys, aggs)             // incr
    GraftTable.merge(spark, base,                                     // v3:
      slice(0).withColumn("o_totalprice", col("o_totalprice") * 2),   // rewrite
      Seq("o_orderkey"))
    MaterializedView.refresh(spark, base, mv, keys, aggs)             // full
    GraftTable.write(spark, slice(2), base, "append")                 // v4
    MaterializedView.refresh(spark, base, mv, keys, aggs)             // incr
    GraftTable.read(spark, mv)
      .select(col("o_orderstatus"), col("n"),
        col("sum_v").cast("double").as("sum_v"))
      .orderBy(col("o_orderstatus"))
  }

  /** EP25 — AUTOMATIC log-level file skipping through the config
    * surface: the table is OPTIMIZE'd into a z-ordered layout (each file
    * a small square of the (o_orderkey, o_totalprice) grid), its add
    * actions carry footer min/max, and a plain YAML `filter` prunes
    * files from the LOG alone — the predicate pushes down into the
    * GraftFileIndex behind every graft_table read, so NO `rangeCol`
    * declaration exists anymore; the scan derives the skip from the
    * query's own pushed filters (the Delta data-skipping contract). The
    * oracle replays the plain WHERE; the pruning is pinned in
    * GraftTableSpec (candidate-file counts via lastPrune) and the layout
    * bounds in ZOrderSpec. */
  val ep25: QueryDef = m(
    "ep25_graft_skipping",
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |WHERE o_orderkey BETWEEN 4000 AND 6000
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    import graft.tables.GraftTable
    val root = s"$ioDir/skip_q"
    val rootPath = new org.apache.hadoop.fs.Path(root)
    rootPath.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(rootPath, true)
    GraftTable.write(spark,
      Tables.orders(spark, dir).select(col("o_orderkey"), col("o_totalprice")),
      root, "overwrite")
    GraftTable.optimize(spark, root, targetFiles = 16,
      zorderBy = Seq("o_orderkey", "o_totalprice"))
    PipelineRunner.run(spark,
      s"""name: ep25_skip
         |source: {format: graft_table, path: "$root"}
         |transforms:
         |  - {op: filter, expr: "o_orderkey BETWEEN 4000 AND 6000"}
         |  - {op: sort, cols: [o_orderkey]}
         |""".stripMargin).passed
  }

  /** EP26 — version-to-version CDC by COMPOSITION: the `diff` transform
    * over two time-traveled reads of ONE graft_table (versionAsOf 1 vs
    * 3). This recovers a full insert/update/delete change stream between
    * any two versions — something the append-only change feed (ep22)
    * deliberately does not offer — from pieces that already exist: time
    * travel + the snapshot-diff join. One full-outer shuffle on the key;
    * at 100 TB you diff the two snapshots you actually need, not the log. */
  val ep26: QueryDef = m(
    "ep26_config_version_diff",
    """WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders)
      |SELECT * FROM (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice,
      |    'update' AS change FROM o WHERE o_orderkey % 100 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 1000000, o_orderstatus, o_totalprice,
      |    'insert' FROM o WHERE o_orderkey % 100 = 50
      |  UNION ALL
      |  SELECT o_orderkey, CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE),
      |    'delete' FROM o WHERE o_orderkey % 100 = 1)
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    import graft.tables.GraftTable
    val root = s"$ioDir/vdiff_q"
    val rootPath = new org.apache.hadoop.fs.Path(root)
    rootPath.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(rootPath, true)
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    GraftTable.write(spark, o, root, "overwrite")                       // v1
    val changes = o.where(col("o_orderkey") % 100 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .unionByName(o.where(col("o_orderkey") % 100 === 50)
        .withColumn("o_orderkey", col("o_orderkey") + 1000000L))
    GraftTable.merge(spark, root, changes, Seq("o_orderkey"))           // v2
    GraftTable.merge(spark, root,
      o.where(col("o_orderkey") % 100 === 1), Seq("o_orderkey"), "delete") // v3
    PipelineRunner.run(spark,
      s"""name: ep26_vdiff
         |source: {format: graft_table, path: "$root", options: {versionAsOf: "1"}}
         |transforms:
         |  - op: diff
         |    on: [o_orderkey]
         |    table: {format: graft_table, path: "$root", options: {versionAsOf: "3"}}
         |  - {op: sort, cols: [o_orderkey]}
         |""".stripMargin).passed
  }

  /** EP27 — conditional MERGE through the config surface: the change set
    * doubles even keys' price and halves odd keys', but the
    * `s.o_totalprice > t.o_totalprice` clause lets only the RAISES
    * through — the lakehouse last-writer-wins CDC pattern (stale source
    * rows drop, the target survives). Oracle replays the election. */
  val ep27: QueryDef = m(
    "ep27_config_cdc_upsert",
    """SELECT o_orderkey, o_orderstatus,
      |  CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice * 2
      |       ELSE o_totalprice END AS o_totalprice
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    import graft.tables.GraftTable
    val root = s"$ioDir/cdc_q"
    val rootPath = new org.apache.hadoop.fs.Path(root)
    rootPath.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(rootPath, true)
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    GraftTable.write(spark, o, root, "overwrite")
    o.withColumn("o_totalprice",
      when(col("o_orderkey") % 2 === 0, col("o_totalprice") * 2)
        .otherwise(col("o_totalprice") * 0.5))
      .write.mode("overwrite").parquet(s"$ioDir/cdc_changes")
    PipelineRunner.run(spark,
      s"""name: ep27_cdc
         |source: {format: parquet, path: "$ioDir/cdc_changes"}
         |transforms: []
         |sink: {format: graft_table, path: "$root", mode: merge,
         |  options: {on: "o_orderkey",
         |            condition: "s.o_totalprice > t.o_totalprice"}}
         |""".stripMargin)
    GraftTable.read(spark, root).orderBy(col("o_orderkey"))
  }

  /** EP28 — the DECLARED materialized view (`mode: mv_refresh` + an
    * `mv:` block): the same YAML runs twice — create, then an
    * incremental advance after the base appended — and the second run's
    * returned view must equal the from-scratch aggregate. The library
    * path is ep24; this pins the config surface end-to-end. */
  val ep28: QueryDef = m(
    "ep28_config_declared_mv",
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2)
      |    AS DECIMAL(18,2)) AS DOUBLE) AS sum_v,
      |  min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
      |FROM orders GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
    import graft.tables.GraftTable
    val base = s"$ioDir/dmv_base"; val mv = s"$ioDir/dmv_view"
    Seq(base, mv).foreach { r =>
      val p = new org.apache.hadoop.fs.Path(r)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val yaml =
      s"""name: ep28_mv
         |mode: mv_refresh
         |source: {format: graft_table, path: "$base"}
         |mv:
         |  path: "$mv"
         |  keys: [o_orderstatus]
         |  aggs: ["count() AS n",
         |         "sum(CAST(o_totalprice AS DECIMAL(12,2))) AS sum_v",
         |         "min(o_orderkey) AS first_key",
         |         "max(o_orderkey) AS last_key"]
         |""".stripMargin
    GraftTable.write(spark, o.where(col("o_orderkey") % 2 === 0),
      base, "overwrite")
    PipelineRunner.run(spark, yaml) // create
    GraftTable.write(spark, o.where(col("o_orderkey") % 2 === 1),
      base, "append")
    PipelineRunner.run(spark, yaml).passed // incremental advance
      .select(col("o_orderstatus"), col("n"),
        col("sum_v").cast("double").as("sum_v"),
        col("first_key"), col("last_key"))
      .orderBy(col("o_orderstatus"))
  }

  /** EP29 — declared DELETE WHERE (`mode: maintenance`): predicate
    * delete as copy-on-write (the GDPR/TTL workhorse), driven through
    * the YAML surface. The oracle pins row-level semantics (the
    * surviving set is exactly `NOT pred`); GraftTableSpec pins the
    * physical claims that make it a 100 TB operation — untouched files
    * survive by reference (no rewrite), all-match files drop by pure
    * metadata remove, only boundary files are rewritten. */
  val ep29: QueryDef = m(
    "ep29_delete_where",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
      |FROM lineitem
      |WHERE l_quantity <= 30 OR l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate""".stripMargin) { (spark, dir) =>
    import graft.tables.GraftTable
    val root = s"$ioDir/acid_delw"
    val rootPath = new org.apache.hadoop.fs.Path(root)
    rootPath.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(rootPath, true)
    GraftTable.write(spark, Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_shipdate")), root, "overwrite")
    PipelineRunner.run(spark,
      s"""name: ep29_ttl
         |mode: maintenance
         |maintenance:
         |  op: delete_where
         |  path: "$root"
         |  where: "l_quantity > 30 AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'"
         |""".stripMargin).passed
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_shipdate"))
  }

  /** EP30 — declared UPDATE WHERE (`mode: maintenance`): predicate
    * update as copy-on-write through the YAML surface.
    * Assignments evaluate against the ORIGINAL row (SQL UPDATE
    * semantics — the predicate and every SET expression see pre-update
    * values) and only files containing a matching row are rewritten.
    * The oracle is the equivalent CASE WHEN projection over the source. */
  val ep30: QueryDef = m(
    "ep30_update_where",
    """SELECT o_orderkey,
      |  CASE WHEN o_orderstatus = 'F' AND o_orderkey % 7 = 0
      |       THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
      |  CASE WHEN o_orderstatus = 'F' AND o_orderkey % 7 = 0
      |       THEN o_totalprice + 100.0 ELSE o_totalprice END AS o_totalprice
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    import graft.tables.GraftTable
    val root = s"$ioDir/acid_updw"
    val rootPath = new org.apache.hadoop.fs.Path(root)
    rootPath.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(rootPath, true)
    GraftTable.write(spark, Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")),
      root, "overwrite")
    PipelineRunner.run(spark,
      s"""name: ep30_correction
         |mode: maintenance
         |maintenance:
         |  op: update_where
         |  path: "$root"
         |  where: "o_orderstatus = 'F' AND o_orderkey % 7 = 0"
         |  set: {o_orderstatus: "'X'", o_totalprice: "o_totalprice + 100.0"}
         |""".stripMargin).passed.orderBy(col("o_orderkey"))
  }

  /** EP31 — declared RESTORE (`mode: maintenance`): roll back a bad
    * write as a new commit,
    * pure log metadata (no data file read or written — the physical
    * claim GraftTableSpec pins). Here: publish v1, append v2, fat-finger
    * a predicate delete (v3), restore to v2 (v4) — the read-back is
    * exactly the pre-delete content, while v3 stays time-travelable. */
  val ep31: QueryDef = m(
    "ep31_restore",
    """SELECT o_orderkey, o_orderstatus, o_totalprice
      |FROM orders WHERE o_orderkey % 3 IN (0, 1)
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    import graft.tables.GraftTable
    val root = s"$ioDir/acid_restore"
    val rootPath = new org.apache.hadoop.fs.Path(root)
    rootPath.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(rootPath, true)
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    GraftTable.write(spark, base.where(col("o_orderkey") % 3 === 0),
      root, "overwrite")                                   // v1
    GraftTable.write(spark, base.where(col("o_orderkey") % 3 === 1),
      root, "append")                                      // v2
    GraftTable.deleteWhere(spark, root, "o_totalprice < 150000.0") // v3: oops
    PipelineRunner.run(spark,
      s"""name: ep31_rollback
         |mode: maintenance
         |maintenance: {op: restore, path: "$root", to_version: 2}
         |""".stripMargin).passed.orderBy(col("o_orderkey"))  // v4 == v2
  }

  /** EP32 — declared CHECK constraint (`mode: maintenance` op
    * add_constraint): the write-side data contract. Adding validates ALL
    * live data first (one short-circuit probe); every later write
    * enforces on its delta only — here a config-surface append commits
    * through the constraint gate. Rejection paths (violating appends /
    * updates / merges abort naming the constraint, nothing commits) are
    * pinned in GraftTableSpec; the oracle pins that the guarded pipeline
    * lands exactly the source rows. */
  val ep32: QueryDef = m(
    "ep32_config_constraint",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    import graft.tables.GraftTable
    val root = s"$ioDir/acid_cons"
    val rootPath = new org.apache.hadoop.fs.Path(root)
    rootPath.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(rootPath, true)
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
    GraftTable.write(spark, base.where(col("o_orderkey") % 2 === 0),
      root, "overwrite")
    PipelineRunner.run(spark,
      s"""name: ep32_contract
         |mode: maintenance
         |maintenance:
         |  op: add_constraint
         |  path: "$root"
         |  constraint_name: price_pos
         |  check: "o_totalprice > 0.0"
         |""".stripMargin)
    base.where(col("o_orderkey") % 2 === 1)
      .write.mode("overwrite").parquet(s"$ioDir/acid_cons_src")
    PipelineRunner.run(spark, // append THROUGH the constraint gate
      s"""name: ep32_guarded_append
         |source: {format: parquet, path: "$ioDir/acid_cons_src"}
         |sink: {format: graft_table, path: "$root", mode: append}
         |""".stripMargin)
    GraftTable.read(spark, root).orderBy(col("o_orderkey"))
  }

  /** EP33 — multi-document YAML chain (`PipelineRunner.runAll`): one
    * declared file runs publish → TTL delete → compaction → read as
    * ordered activities (ADF "pipeline with activities" parity; the
    * maintenance lifecycle's natural home). Fail-fast ordering is
    * spec-tested; the oracle pins the end state: exactly the surviving
    * rows, through the compacted layout. */
  val ep33: QueryDef = m(
    "ep33_config_chain",
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_totalprice >= 50000.0 ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    val root = s"$ioDir/acid_chain"
    val rootPath = new org.apache.hadoop.fs.Path(root)
    rootPath.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(rootPath, true)
    Tables.orders(spark, dir).select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$ioDir/chain_src")
    PipelineRunner.runAll(spark,
      s"""name: chain_publish
         |source: {format: parquet, path: "$ioDir/chain_src"}
         |sink: {format: graft_table, path: "$root", mode: overwrite}
         |---
         |name: chain_ttl
         |mode: maintenance
         |maintenance: {op: delete_where, path: "$root",
         |              where: "o_totalprice < 50000.0"}
         |---
         |name: chain_compact
         |mode: maintenance
         |maintenance: {op: optimize, path: "$root", target_files: 2}
         |---
         |name: chain_read
         |source: {format: graft_table, path: "$root"}
         |transforms:
         |  - {op: sort, cols: [o_orderkey]}
         |""".stripMargin).passed
  }

  /** EP34 — FULL change data feed (pre/post images): with the
    * `changeDataFeed=true` table property set, every DML commit
    * (updateWhere / deleteWhere / merge) writes its change rows as
    * `cdf/` sidecar parquet in the SAME atomic commit — pre-images
    * tagged `update_preimage`/`delete`, post-images
    * `update_postimage`/`insert` — and `changesWithImages` replays the
    * whole history as one classified feed (appends deliver as plain
    * inserts, no sidecar needed). The oracle reconstructs the exact
    * feed from the base data: each version's pre/post rows are pure
    * functions of the keys each DML touched. This is the Delta CDF
    * contract: the feed a downstream MV or replica consumes
    * incrementally instead of diffing snapshots. */
  val ep34: QueryDef = m(
    "ep34_graft_cdf",
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
    val root = s"$ioDir/cdf_orders"
    val rootPath = new org.apache.hadoop.fs.Path(root)
    rootPath.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(rootPath, true)
    val o = Tables.orders(spark, dir)
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
    // the config surface reads the classified feed
    PipelineRunner.run(spark,
      s"""name: ep34_feed
         |source: {format: graft_table, path: "$root",
         |  options: {changesFrom: "0", withImages: "true"}}
         |transforms:
         |  - {op: select, cols: [o_orderkey, o_totalprice, _change_type, _commit_version]}
         |  - {op: sort, cols: [_commit_version, _change_type, o_orderkey]}
         |""".stripMargin).passed
  }

  /** EP35 — PARTITIONED table lifecycle through the config surface:
    * publish orders hive-partitioned by o_orderstatus (partitionBy on the
    * graft_table sink; Iceberg-style identity partitioning — the column
    * stays in the data, files land under data/o_orderstatus=X/ with
    * partitionValues logged per add), then `drop_partition` retires the
    * 'F' partition as a PURE metadata remove — zero bytes read or
    * written, the 100 TB partition-aligned TTL fast path — and the final
    * read returns the surviving partitions. The oracle replays the drop
    * as a plain WHERE; the zero-byte guarantee and pruned listing are
    * pinned in GraftTableSpec. */
  val ep35: QueryDef = m(
    "ep35_partitioned_table",
    """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |WHERE o_orderstatus <> 'F' ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    val root = s"$ioDir/part_orders"
    val rootPath = new org.apache.hadoop.fs.Path(root)
    rootPath.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(rootPath, true)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$ioDir/part_src")
    PipelineRunner.runAll(spark,
      s"""name: part_publish
         |source: {format: parquet, path: "$ioDir/part_src"}
         |sink: {format: graft_table, path: "$root", mode: overwrite,
         |       partitionBy: [o_orderstatus]}
         |---
         |name: part_retire
         |mode: maintenance
         |maintenance: {op: drop_partition, path: "$root",
         |              partition: {o_orderstatus: "F"}}
         |---
         |name: part_read
         |source: {format: graft_table, path: "$root"}
         |transforms:
         |  - {op: sort, cols: [o_orderkey]}
         |""".stripMargin).passed
  }

  /** EP36 — merge-on-read DML (deletion vectors) through the config
    * surface: with `deletionVectors=true` set via a set_property
    * activity, the chained TTL delete and predicate update extend
    * per-file vector sidecars instead of rewriting boundary files —
    * frequent small DML writes O(changed rows), not O(touched files).
    * The oracle pins row-level semantics (identical to the copy-on-write
    * answer); GraftTableSpec pins the physical claims (a 1-row update
    * stages one 1-row file and removes nothing, OPTIMIZE materializes
    * vectors away, restore reconciles vector state). */
  val ep36: QueryDef = m(
    "ep36_dv_dml",
    """SELECT o_orderkey, o_custkey,
      |  CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice * 2
      |       ELSE o_totalprice END AS o_totalprice
      |FROM orders WHERE NOT (o_totalprice < 50000.0)
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    val root = s"$ioDir/acid_dv"
    val rootPath = new org.apache.hadoop.fs.Path(root)
    rootPath.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(rootPath, true)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$ioDir/dv_src")
    PipelineRunner.runAll(spark,
      s"""name: dv_publish
         |source: {format: parquet, path: "$ioDir/dv_src"}
         |sink: {format: graft_table, path: "$root", mode: overwrite}
         |---
         |name: dv_enable
         |mode: maintenance
         |maintenance: {op: set_property, path: "$root",
         |              set: {deletionVectors: "true"}}
         |---
         |name: dv_ttl
         |mode: maintenance
         |maintenance: {op: delete_where, path: "$root",
         |              where: "o_totalprice < 50000.0"}
         |---
         |name: dv_reprice
         |mode: maintenance
         |maintenance: {op: update_where, path: "$root",
         |              where: "o_orderkey % 100 = 0",
         |              set: {o_totalprice: "o_totalprice * 2"}}
         |---
         |name: dv_read
         |source: {format: graft_table, path: "$root"}
         |transforms:
         |  - {op: sort, cols: [o_orderkey]}
         |""".stripMargin).passed
  }

  /** EP37 — COLUMN MAPPING (rename/drop without rewrite) through the
    * config surface: `rename_column` re-points the logical name at the
    * files' stable physical name as ONE metadata commit — zero data IO,
    * old files and time travel intact — and `drop_column` removes a
    * field the same way; post-rename appends and predicate DML compose
    * under the new name (files stage under physical names; reads
    * project back). The oracle replays the lifecycle as plain SQL over
    * the base table: the rename is an alias, the drop a projection, the
    * update a CASE. GraftTableSpec pins the physical claims (no file
    * rewritten by the rename, fresh physical for a re-added name,
    * minReader-3 checkpoints). */
  val ep37: QueryDef = m(
    "ep37_column_mapping",
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1000.0
      |       ELSE o_totalprice END AS price
      |FROM orders
      |UNION ALL
      |SELECT o_orderkey + 5000000, o_totalprice AS price FROM orders
      |WHERE o_orderkey % 100 = 7
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    val root = s"$ioDir/acid_colmap"
    val rootPath = new org.apache.hadoop.fs.Path(root)
    rootPath.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(rootPath, true)
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    o.write.mode("overwrite").parquet(s"$ioDir/colmap_src")
    // post-rename appends arrive under the NEW logical schema
    o.where(col("o_orderkey") % 100 === 7)
      .withColumn("o_orderkey", col("o_orderkey") + 5000000L)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").as("price"))
      .write.mode("overwrite").parquet(s"$ioDir/colmap_late")
    PipelineRunner.runAll(spark,
      s"""name: cm_publish
         |source: {format: parquet, path: "$ioDir/colmap_src"}
         |sink: {format: graft_table, path: "$root", mode: overwrite}
         |---
         |name: cm_rename
         |mode: maintenance
         |maintenance: {op: rename_column, path: "$root",
         |              set: {o_totalprice: price}}
         |---
         |name: cm_append
         |source: {format: parquet, path: "$ioDir/colmap_late"}
         |sink: {format: graft_table, path: "$root", mode: append}
         |---
         |name: cm_reprice
         |mode: maintenance
         |maintenance: {op: update_where, path: "$root",
         |              where: "o_orderkey % 10 = 0 AND o_orderkey < 5000000",
         |              set: {price: "price + 1000.0"}}
         |---
         |name: cm_shed
         |mode: maintenance
         |maintenance: {op: drop_column, path: "$root", column: o_custkey}
         |---
         |name: cm_read
         |source: {format: graft_table, path: "$root"}
         |transforms:
         |  - {op: sort, cols: [o_orderkey]}
         |""".stripMargin).passed
  }

  /** EP38 — NAME-ADDRESSABLE CATALOG (DSv2 TableCatalog, VERDICT r19
    * task 1): the pipeline publishes orders into the graft catalog by
    * NAME — `sink: {table: db.orders_ep38}`, no path string in the YAML
    * — and the result is `spark.sql` over `graft.db.orders_ep38`, whose
    * V1Scan compiles onto the same GraftFileIndex plan as the path API
    * (pushed date filter prunes files from logged min/max; projection
    * reaches the parquet scan). The oracle replays the identical SQL
    * over the raw parquet. CatalogSpec pins the DDL/DML/time-travel
    * lifecycle; this query pins the config-surface + SQL round trip. */
  val ep38: QueryDef = m(
    "ep38_catalog_table",
    """SELECT o_orderpriority, count(*) AS n, sum(o_totalprice) AS total
      |FROM orders
      |WHERE o_orderdate >= DATE '1995-01-01'
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
    val wh = s"$ioDir/catalog_wh_ep38"
    val whPath = new org.apache.hadoop.fs.Path(wh)
    whPath.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(whPath, true)
    // runtime registration: catalogs resolve lazily from the conf, so a
    // session needs no restart to gain the graft catalog
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    PipelineRunner.run(spark,
      s"""name: ep38_publish
         |source: {format: parquet, path: "$dir/orders.parquet"}
         |sink: {format: graft_table, table: db.orders_ep38, mode: overwrite}
         |""".stripMargin)
    spark.sql(
      """SELECT o_orderpriority, count(*) AS n, sum(o_totalprice) AS total
        |FROM graft.db.orders_ep38
        |WHERE o_orderdate >= DATE '1995-01-01'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** EP39 — SPAN DEDUP ON THE CONFIG SURFACE (VERDICT r19 task 3):
    * `op: span_dedup {cols: [doc_id, text]}` runs j20's exact-substring
    * election at the published default bar — Lee et al. 2022's 50-token
    * minimum span (arXiv:2107.06499) — with k left at its 8-token match
    * window. The oracle replays the IDENTICAL election in DuckDB at
    * L=50, so the default-bar semantics (not just the sf-tuned L=16 of
    * j20) are hash-checked cross-engine. PlanSpec's no-single-partition
    * pin covers the shared spanDedupOf plan. */
  val ep39: QueryDef = m(
    "ep39_config_span_dedup",
    """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
      |  FROM documents),
      |wins AS (SELECT doc_id, i AS pos,
      |    array_to_string(toks[(i+1):(i+8)], ' ') AS win
      |  FROM t, UNNEST(range(0, len(toks) - 8 + 1)) AS u(i)
      |  WHERE len(toks) >= 8),
      |r AS (SELECT doc_id, pos,
      |    row_number() OVER (PARTITION BY win ORDER BY doc_id, pos) AS rn
      |  FROM wins),
      |mk AS (SELECT doc_id, pos FROM r WHERE rn > 1),
      |g AS (SELECT doc_id, pos,
      |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      |  FROM mk),
      |runs AS (SELECT doc_id, min(pos) AS s, max(pos) AS e
      |  FROM g GROUP BY doc_id, grp
      |  HAVING max(pos) - min(pos) + 8 >= 50),
      |rem AS (SELECT DISTINCT doc_id, s + j AS tp
      |  FROM runs, UNNEST(range(0, e - s + 8)) AS v(j)),
      |toksp AS (SELECT doc_id, tp, toks[CAST(tp AS INT) + 1] AS tok
      |  FROM t, UNNEST(range(0, len(toks))) AS u(tp)),
      |keep AS (SELECT p.doc_id, p.tp, p.tok
      |  FROM toksp p LEFT JOIN rem ON p.doc_id = rem.doc_id AND p.tp = rem.tp
      |  WHERE rem.tp IS NULL),
      |agg AS (SELECT doc_id, COUNT(*) AS kept_tokens,
      |    string_agg(tok, ' ' ORDER BY tp) AS text_dedup
      |  FROM keep GROUP BY doc_id)
      |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
      |  CAST(COALESCE(agg.kept_tokens, 0) AS BIGINT) AS kept_tokens,
      |  COALESCE(agg.text_dedup, '') AS text_dedup
      |FROM t LEFT JOIN agg USING (doc_id)
      |ORDER BY t.doc_id""".stripMargin) { (spark, dir) =>
    PipelineRunner.run(spark,
      s"""name: ep39_span
         |source: {format: parquet, path: "$dir/documents.parquet"}
         |transforms:
         |  - {op: span_dedup, cols: [doc_id, text]}
         |  - {op: select, cols: [doc_id, n_tokens, kept_tokens, text_dedup]}
         |  - {op: sort, cols: [doc_id]}
         |""".stripMargin).passed
  }

  override def defs: Seq[QueryDef] =
    Seq(a3, a3b, a3c, a4, a4b, a4c, a5, a7, a7b, ep1, ep1b, ep2, ep2b, ep3,
      ep3b, ep4, ep5, ep5b, ep6, ep7, ep7b, ep8, ep9, ep10, ep11, ep12, ep13,
      ep14, ep15, ep16, ep17, ep18, ep19, ep20, ep21, ep22, ep23, ep24, ep25,
      ep26, ep27, ep28, ep29, ep30, ep31, ep32, ep33, ep34, ep35, ep36, ep37,
      ep38, ep39)
}
