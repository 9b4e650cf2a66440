package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

import graft.queries._

/** Golden-plan assertions (SURVEY §5.2 item 6): the physical plans that
  * carry the 100 TB posture must actually materialize — predicate pushdown
  * into the parquet scan, column pruning, pinned broadcasts, top-k without
  * a global sort, and whole-stage codegen spans. */
class PlanSpec extends SparkSpecBase {

  private def plan(d: DataFrame): String =
    d.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("pricing_summary: shipdate predicate pushed into the parquet scan") {
    val p = plan(Relational.pricingSummary.build(spark, sf))
    p should include("PushedFilters")
    p should include regex "PushedFilters: \\[.*l_shipdate.*\\]"
    // column pruning: the scan must not read the unused l_comment-ish width;
    // ReadSchema lists only referenced columns
    p should include regex "ReadSchema: [^\\n]*l_returnflag"
    "ReadSchema: [^\\n]*l_partkey".r.findFirstIn(p) shouldBe None
  }

  test("d1: dimension joins run as BroadcastHashJoin (no fact shuffle)") {
    val p = plan(Joins.d1.build(spark, sf))
    p should include("BroadcastHashJoin")
    (p should not).include("SortMergeJoin")
  }

  test("g2/k4: ordered limit plans as TakeOrderedAndProject, not global sort") {
    plan(Windows.g2.build(spark, sf)) should include("TakeOrderedAndProject")
    plan(Similarity.k4.build(spark, sf)) should include("TakeOrderedAndProject")
  }

  test("b4: filter grammar pushes supported predicates to the scan") {
    val p = plan(Relational.b4.build(spark, sf))
    p should include regex "PushedFilters: \\[.*o_totalprice.*\\]"
  }

  test("e1: aggregation is two-phase hash (map-side partial combine)") {
    val p = plan(Aggregates.e1.build(spark, sf))
    p should include("HashAggregate")
    // partial + final = the string appears at least twice
    p.sliding("HashAggregate".length).count(_ == "HashAggregate") should be >= 2
  }

  test("a7b: bucketed join runs with no Exchange on either side") {
    // the 100-TB amortization play: bucketBy at write time removes the
    // shuffle from EVERY later join on that key — the join subtree up to
    // the aggregation must be exchange-free (SelectedBucketsCount in the
    // scans), with the one legitimate Exchange left for the groupBy
    val d = Sources.a7b.build(spark, sf)
    val p = plan(d)
    withClue(p) {
      p should include("SelectedBucketsCount")
      p should include("SortMergeJoin")
      // a broken bucket join would re-shuffle on the join key; the only
      // legitimate exchanges are the groupBy's and the final orderBy's
      (p should not).include("Exchange hashpartitioning(l_orderkey")
      (p should not).include("Exchange hashpartitioning(o_orderkey")
    }
    d.collect().length should be > 0
  }

  test("K12: the CC round join reuses the edge checkpoint's partitioning (labels alone shuffle)") {
    import graft.core.Checkpoints
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // connectedComponents pre-partitions the symmetric edge set on dst
    // and checkpoints it WITH AQE DISABLED — a checkpoint only carries
    // its physical partitioning forward when the captured plan is not
    // wrapped in AdaptiveSparkPlanExec (AQE reports UnknownPartitioning
    // at capture time). With the layout preserved, every propagation
    // round plans exactly ONE exchange (the label side); the static edge
    // set never moves again. At cluster scale that is one edge shuffle
    // total instead of one per round.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // at CC scale BOTH sides are far past the broadcast threshold — model
    // that here, else the toy label set broadcasts and proves nothing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val sym = Checkpoints.eager(
      Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
        .repartition(col("dst")))
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("vec_id", "lbl")
    try {
      val round = sym.join(labels.withColumnRenamed("vec_id", "dst2"),
          col("dst") === col("dst2"))
        .select(col("src").as("vec_id"), col("lbl"))
      val p = plan(round)
      withClue(p) {
        // exactly one Exchange, and it shuffles the LABEL key — the edge
        // side reads its preserved hashpartitioning(dst) straight from
        // the checkpoint (formatted mode prints the Exchange node and its
        // partitioning arguments on separate lines)
        "\\) Exchange".r.findAllIn(p).size shouldBe 1
        "hashpartitioning\\(dst2#".r.findAllIn(p).size should be >= 1
      }
      round.count() shouldBe 4
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      Checkpoints.release(sym)
    }
  }

  test("K12: the single-exchange CC round survives RELIABLE checkpoint mode") {
    import graft.core.Checkpoints
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // Same invariant as the localCheckpoint case above, asserted in the
    // mode a real cluster runs: graft.checkpoint.dir set → Checkpoints
    // routes through Dataset.checkpoint() (ReliableCheckpointRDD on a
    // shared FS). Dataset.checkpoint captures the physical plan's
    // outputPartitioning into the LogicalRDD exactly like localCheckpoint
    // does, so the pre-partitioned edge set must STILL join without its
    // own Exchange — if reliable mode silently dropped the layout, every
    // CC round on a 1000-executor cluster would re-shuffle the full edge
    // set, the exact regression this test pins against.
    val ckDir = java.nio.file.Files.createTempDirectory("graft-reliable-ck")
    sys.props("graft.checkpoint.dir") = ckDir.toString
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val sym = Checkpoints.eager(
        Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
          .repartition(col("dst")))
      try {
        val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("vec_id", "lbl")
        val round = sym.join(labels.withColumnRenamed("vec_id", "dst2"),
            col("dst") === col("dst2"))
          .select(col("src").as("vec_id"), col("lbl"))
        val p = plan(round)
        withClue(p) {
          "\\) Exchange".r.findAllIn(p).size shouldBe 1
          "hashpartitioning\\(dst2#".r.findAllIn(p).size should be >= 1
        }
        round.count() shouldBe 4
      } finally Checkpoints.release(sym)
    } finally {
      sys.props.remove("graft.checkpoint.dir")
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      org.apache.commons.io.FileUtils.deleteQuietly(ckDir.toFile)
    }
  }

  test("d9: the salt reaches the shuffle keys (hot users spread over S partitions)") {
    val p = plan(Joins.d9.build(spark, sf))
    withClue(p) {
      // both sides exchange on (user key, salt) — the salted composite key
      // is what breaks a Zipf-hot user_id across S reducers (formatted mode
      // prints the Exchange node and its hashpartitioning args on separate
      // lines, so match the partitioning expression itself)
      p should include regex "hashpartitioning\\(user_id[^\\n]*salt"
      p should include regex "hashpartitioning\\(d_user_id[^\\n]*d_salt"
      (p should not).include("BroadcastHashJoin") // broadcast would dodge skew
    }
  }

  test("AQE skew join: a hot key is split at runtime without manual salting") {
    // the runtime complement to d9's explicit salting: AQE detects the
    // oversized shuffle partition AFTER the map stage and splits it into
    // several reader tasks (the executed SortMergeJoin prints skew=true).
    // At 100 TB this is the default first line of defense; salting remains
    // for joins AQE can't rewrite (e.g. aggregations over the hot key).
    import org.apache.spark.sql.functions.{col, expr, lit}
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      // thresholds scaled down so a test-sized hot key trips the detector
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // one key owns ~99% of the left side — the Zipf-head shape. The pad
      // must be DATA-DEPENDENT: a literal would be projected after the
      // exchange and the shuffled hot partition would stay tiny
      val left = spark.range(0, 60000)
        .select((col("id") % 100).as("k"), col("id").as("v"))
        .withColumn("k", expr("CASE WHEN v % 100 < 99 THEN 0 ELSE k END"))
        .withColumn("pad", expr("repeat(CAST(v AS STRING), 16)"))
      val right = spark.range(0, 100).select(col("id").as("k"), lit(1).as("w"))
      val joined = left.join(right, "k").select(col("k"), col("pad"), col("w"))
      // collect() drives THIS Dataset's own QueryExecution, so the
      // adaptive plan below is the finalized one
      joined.collect().length shouldBe 60000
      val p = joined.queryExecution.executedPlan.toString()
      withClue(p.linesIterator.take(30).mkString("\n")) {
        p should include("skew=true")
      }
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("merge: anti join shuffles each side once on the key, union adds none") {
    import java.nio.file.Files
    import graft.pipeline.PipelineRunner
    val delDir = Files.createTempDirectory("graft_plan_merge").toString
    spark.read.parquet(s"$sf/nation.parquet")
      .where(org.apache.spark.sql.functions.col("n_nationkey") < 3)
      .write.mode("overwrite").parquet(delDir)
    // force the at-scale shape: neither fact side broadcastable → SMJ anti
    // with exactly one hashpartitioning exchange per side on the merge key
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val d = PipelineRunner.run(spark,
        s"""name: plan_merge
           |source: {format: parquet, path: "$sf/nation.parquet"}
           |transforms:
           |  - {op: merge, how: delete, on: [n_nationkey],
           |     table: {format: parquet, path: "$delDir"}}
           |""".stripMargin).passed
      val p = plan(d)
      withClue(p) {
        p should include("LeftAnti")
        // formatted mode prints the Exchange node and its partitioning
        // arguments on separate lines (same as d9) — count the args
        "hashpartitioning\\(n_nationkey".r.findAllIn(p).size shouldBe 2
        // and nothing else shuffles: no range/single-partition exchanges
        (p should not).include("Exchange rangepartitioning")
        (p should not).include("Exchange SinglePartition")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("merge scd2: single-pass versioning — the join subtree is never duplicated") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions.{col, lit}
    import graft.pipeline.PipelineRunner
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_plan_scd2").toString
    def d(s: String) = java.sql.Date.valueOf(s)
    Seq((1L, "a", 1L, d("2024-01-01"), null.asInstanceOf[java.sql.Date], true),
        (2L, "b", 2L, d("2024-01-01"), null.asInstanceOf[java.sql.Date], true))
      .toDF("k", "name", "region", "valid_from", "valid_to", "is_current")
      .write.mode("overwrite").parquet(s"$dir/base")
    Seq((1L, "a", 9L), (3L, "c", 3L)).toDF("k", "name", "region")
      .withColumn("eff", lit(d("2025-01-01")))
      .write.mode("overwrite").parquet(s"$dir/chg")
    val out = PipelineRunner.run(spark,
      s"""name: plan_scd2
         |source: {format: parquet, path: "$dir/base"}
         |transforms:
         |  - {op: merge, how: scd2, on: [k], expr: eff,
         |     table: {format: parquet, path: "$dir/chg"}}
         |""".stripMargin).passed
    // exactly TWO joins in the whole plan: the versioning outer join +
    // the insert anti join. A filter-per-branch union would carry the
    // outer join once per branch (Spark does not dedupe union legs) —
    // 3x the dominant cost at scale. One Generate flattens the
    // close-out/new-version/no-op structs out of the single join pass.
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join}
    val opt = out.queryExecution.optimizedPlan
    withClue(plan(out)) {
      opt.collect { case j: Join => j.joinType.sql }.sorted shouldBe
        Seq("LEFT ANTI", "LEFT OUTER")
      opt.collect { case g: Generate => g }.size shouldBe 1
    }
  }

  test("pivot: explicit values mean NO value-discovery job at plan-build time") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    import graft.pipeline.PipelineRunner
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        stages.add(js.stageInfos.map(_.name).mkString(";"))
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // build (no action): an IMPLICIT pivot would run an eager distinct
      // job right here to discover values — explicit values must not
      PipelineRunner.run(spark,
        s"""name: plan_pivot
           |source: {format: parquet, path: "$sf/nation.parquet"}
           |transforms:
           |  - {op: pivot, cols: [n_regionkey], name: n_name,
           |     values: [ALGERIA, ARGENTINA], aggs: ["COUNT(*)"]}
           |""".stripMargin).passed
      var last = -1 // listener delivery is async — wait until it settles
      var spins = 0
      while (stages.size != last && spins < 20) {
        last = stages.size; Thread.sleep(200); spins += 1
      }
      import scala.jdk.CollectionConverters._
      // the only permissible job is the parquet footer read — any
      // collect/distinct-shaped job is the discovery scan this test bans
      withClue(stages.asScala.mkString("\n")) {
        stages.asScala.filterNot(_.contains("parquet at")) shouldBe empty
      }
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("ep9: the incremental watermark comparison pushes into the scan") {
    val p = plan(Sources.ep9.build(spark, sf))
    p should include regex "PushedFilters: \\[.*o_orderdate.*\\]"
  }

  test("partition pruning: static filters and runtime DPP both prune the partitioned scan") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // the 100-TB layout move: facts land partitioned by a coarse key, so
    // key-filtered reads touch only matching directories instead of the
    // whole dataset
    val dir = "/tmp/graft_io/orders_part"
    graft.core.Tables.orders(spark, sf)
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(dir)
    val part = spark.read.parquet(dir)
    // static pruning: the literal filter lands in PartitionFilters (never
    // PushedFilters — it eliminates directories before any file is read)
    val p1 = plan(part.where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey")))
    p1 should include regex "PartitionFilters: \\[[^\\]]*o_orderpriority[^\\]]*\\]"
    // dynamic partition pruning: when the filter arrives via a JOIN whose
    // dim side is only known at runtime, the fact scan still prunes — the
    // broadcast result is reused as a partition-filter subquery. The DPP
    // rule fires when the dim side carries a selective predicate (that is
    // what makes pruning worth inserting).
    // the dim must be a real source with a surviving Filter node — a local
    // Seq folds its filter into the LocalRelation and the DPP rule then
    // sees no selective predicate to reuse
    Seq(("1-URGENT", 1), ("5-LOW", 0)).toDF("prio", "flag")
      .write.mode("overwrite").parquet("/tmp/graft_io/prio_dim")
    val dim = spark.read.parquet("/tmp/graft_io/prio_dim").where(col("flag") === 1)
    // at sf0.001 the cost model (rightly) judges this tiny scan not worth
    // pruning — switch to the fallback-ratio heuristic so the MECHANISM
    // is what's asserted, not the cost model's verdict on 1500 rows
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    val p2 = try plan(part.join(dim, col("o_orderpriority") === col("prio")))
    finally spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    p2.toLowerCase should include("dynamicpruning")
  }

  test("j12: contamination joins the corpus against a BROADCAST benchmark shingle set") {
    val p = plan(graft.queries.TextOps2.j12.build(spark, sf))
    p should include("BroadcastHashJoin")
    // the 100-TB side must never sort-merge against the benchmark
    (p should not).include("SortMergeJoin")
  }

  test("ep8: config ann_topk plans as TakeOrderedAndProject, not a global sort") {
    plan(Sources.ep8.build(spark, sf)) should include("TakeOrderedAndProject")
  }

  test("g4: the Morton code computes inside codegen — no UDF, no extra exchange") {
    val d = Windows.g4.build(spark, sf)
    d.collect()
    // the AQE toString prints Final AND Initial plans — assert on the
    // final section only, or every operator double-counts
    val p = d.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    withClue(p) {
      // pure bit algebra: nothing falls out of codegen into an eval loop
      (p.contains("BatchEvalPython") || p.contains("UDF")) shouldBe false
      // one range exchange for the final sort is the ONLY shuffle — the
      // code itself is a projection over the scan
      "Exchange".r.findAllIn(p).size shouldBe 1
      // the Morton projection sits inside a codegen stage
      p should include regex "\\*\\(\\d+\\) Project [^\\n]*shiftleft"
    }
  }

  test("j15: doc aggregate is two-phase over an exact integer sum (no float agg)") {
    val p = plan(TextOps2.j15.build(spark, sf))
    p should include("partial_sum")
    withClue(p) {
      // the quantized micro-unit sum must aggregate LONGS; the only double
      // arithmetic is the final single division in the result projection
      "partial_sum\\(sum#?\\w*[^\\n]*DOUBLE".r.findFirstIn(p) shouldBe None
    }
  }

  test("j16: the running token total is a DISTRIBUTED prefix sum — no single-partition window") {
    val d = TextOps2.j16.build(spark, sf)
    d.collect()
    val p = d.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    withClue(p) {
      // the naive SUM OVER (ORDER BY key) would plan as
      // `Exchange SinglePartition` + an unpartitioned Window — the whole
      // corpus through ONE task. The bucketed prefix sum must never
      // degenerate to that: its window partitions by the hash-range
      // bucket, the per-bucket totals travel driver-side as `buckets`
      // rows, and the offsets come back as a broadcast join.
      p should not include "SinglePartition"
      p should include("BroadcastHashJoin")
    }
  }

  test("j17: survivor election and per-doc reassembly share the doc_id exchange") {
    val d = TextOps2.j17.build(spark, sf)
    d.collect()
    val p = d.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    withClue(p) {
      // two keyed windows (chunk, then doc_id) + the final presentation
      // sort; the groupBy(doc_id) must REUSE the doc_id window's
      // partitioning rather than add a fourth exchange
      "Exchange".r.findAllIn(p).size shouldBe 3
      p should not include "SinglePartition"
    }
  }

  test("j19: window dedup — every stage keyed, no single-partition exchange, no cartesian") {
    val d = TextOps2.j19.build(spark, sf)
    d.collect()
    val p = d.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    withClue(p) {
      // election shuffles on the window string, removal aggregates on
      // doc_id, the rebuild joins on doc_id — all keyed; the
      // arbitrary-alignment coverage must never cost a global stage or
      // an all-pairs join
      p should not include "SinglePartition"
      p should not include "Cartesian"
    }
  }

  test("j20: run-length span dedup — every stage keyed, no " +
    "single-partition exchange, no cartesian") {
    val d = TextOps2.j20.build(spark, sf)
    d.collect()
    val p = d.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    withClue(p) {
      // election shuffles on the window string, run grouping and removal
      // aggregate on doc_id, the rebuild joins on doc_id — all keyed;
      // hitting the L bar with K-windows must never cost a global stage
      p should not include "SinglePartition"
      p should not include "Cartesian"
    }
  }

  test("d10: snapshot diff is one join over two scans of the same table") {
    val d = Joins.d10.build(spark, sf)
    d.collect()
    val p = d.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    withClue(p) {
      // FULL outer equi-join (shuffle or sort-merge — never a cartesian),
      // classification is row-local algebra after it
      p should include("FullOuter")
      p should not include "Cartesian"
    }
  }

  test("whole-stage codegen covers the scan→filter→project pipeline") {
    // AQE finalizes the physical plan only on execution of THIS dataset's
    // own QueryExecution — collect, then look for codegen stage markers
    // (tree strings print them as "*(n) Project", not "WholeStageCodegen")
    val d = Relational.b2.build(spark, sf)
    d.collect()
    val p = d.queryExecution.executedPlan.toString
    withClue(p) {
      (p.contains("WholeStageCodegen") || p.contains("*(")) shouldBe true
    }
  }

  test("tq3/tq18: composite joins — top-k without global sort, dates pushed, no cartesian") {
    val p3 = plan(Tpch.tq3.build(spark, sf))
    withClue(p3) {
      p3 should include("TakeOrderedAndProject")
      // the date cuts reach both fact scans
      p3 should include regex "PushedFilters: \\[.*o_orderdate.*\\]"
      p3 should include regex "PushedFilters: \\[.*l_shipdate.*\\]"
      p3 should not include "CartesianProduct"
    }
    val p18 = plan(Tpch.tq18.build(spark, sf))
    withClue(p18) {
      p18 should include("TakeOrderedAndProject")
      // the HAVING subquery runs as a semi-join, never a driver IN-list
      p18 should include("LeftSemi")
      p18 should not include "CartesianProduct"
    }
    // Q5's snowflake: region/nation ride broadcasts
    plan(Tpch.tq5.build(spark, sf)) should include("BroadcastHashJoin")
  }

  test("tq19/tq22: disjunctive join stays equi; scalar cut broadcasts; anti-join, no IN-list") {
    val p19 = plan(Tpch.tq19.build(spark, sf))
    withClue(p19) {
      // the cross-table OR must NOT degrade the equi-join to a cartesian
      p19 should not include "CartesianProduct"
      p19 should not include "BroadcastNestedLoopJoin"
      // CNF extraction: each side's disjunctive residue reaches ITS scan
      // as a pushed filter even though no single OR-arm pushes whole
      p19 should include regex "PushedFilters: \\[[^\\n]*p_brand"
      p19 should include regex "PushedFilters: \\[[^\\n]*l_quantity"
    }
    val p22 = plan(Tpch.tq22.build(spark, sf))
    withClue(p22) {
      p22 should include("LeftAnti") // NOT EXISTS, never a driver IN-list
      p22 should include("BroadcastExchange") // the single-row scalar cut
      // the probe-side filter prunes orders before the anti join
      p22 should include regex "PushedFilters: \\[[^\\n]*o_totalprice"
    }
  }

  test("ev1: both session windows AND the rollup share one user_id exchange") {
    val p = plan(Events.ev1.build(spark, sf))
    withClue(p) {
      // exactly two exchanges total: hashpartitioning(user_id) feeding the
      // lag + running-sum windows AND the (user_id, session_seq) aggregate
      // (a hash partitioning on a SUBSET of the grouping keys satisfies
      // the clustering), plus the rangepartitioning of the final order-by
      "\\) Exchange".r.findAllIn(p).size shouldBe 2
      // formatted mode prints the Exchange's partitioning on its
      // Arguments line — exactly one hash exchange, keyed by user_id
      "hashpartitioning\\(user_id".r.findAllIn(p).size shouldBe 1
      (p should not).include("SinglePartition")
    }
  }

  test("ev2: funnel stages aggregate BEFORE their joins (no raw-event window)") {
    val p = plan(Events.ev2.build(spark, sf))
    withClue(p) {
      // each stage is a partial-combined HashAggregate; no Window node at
      // all — the funnel never sorts the raw event stream per user
      (p should not).include("Window")
      p should include("HashAggregate")
      p should not include "CartesianProduct"
    }
  }
}
