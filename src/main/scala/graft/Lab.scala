package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Dev-only measurement scratchpad for the optimization rounds: isolates
  * pipeline stages of the heavy queries and times alternative
  * formulations head-to-head on the bench session config. Never part of
  * the declared query surface — results here feed OPTIMIZATION_rNN.md,
  * the real changes land in the query/operator code.
  *
  *   runMain graft.Lab <experiment> [sfDir]
  */
object Lab {
  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[lab] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  /** Job-counting twin of [[t]]: how many Spark JOBS a phase launched —
    * the per-table-op fixed-cost census (each job is one plan+codegen+
    * schedule round trip; at sf0.1 that fixed cost IS most of an op's
    * wall time, so "N jobs per op class" is the thing to shrink).
    * Listener events are async; the 150 ms drain keeps counts exact for
    * phases that end on an action (every phase here does). */
  private object JobCounter {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    /** Σ wall-clock inside jobs (submit→end), millis — the gap between
      * this and phase wall time is DRIVER work: plan/optimize/codegen,
      * log replay, footer reads, commit IO. */
    val inJobMs = new java.util.concurrent.atomic.AtomicLong
    private val startedAt =
      new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]
    @volatile private var installed = false
    def install(spark: SparkSession): Unit = synchronized {
      if (!installed) {
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onJobStart(
                j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
              jobs.incrementAndGet()
              startedAt.put(j.jobId, j.time)
            }
            override def onJobEnd(
                j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
              val t0 = startedAt.remove(j.jobId)
              if (t0 != null) inJobMs.addAndGet(j.time - t0)
            }
          })
        installed = true
      }
    }
  }
  private def tj[A](spark: SparkSession, label: String)(f: => A): A = {
    JobCounter.install(spark)
    Thread.sleep(150)
    val j0 = JobCounter.jobs.get
    val m0 = JobCounter.inJobMs.get
    val t0 = System.nanoTime()
    val r = f
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(150)
    val inJob = (JobCounter.inJobMs.get - m0) / 1e3
    val attr = graft.core.Attribution.snapshotJson()
    graft.core.Attribution.clear()
    println(f"[lab] $label: $dt%.2fs jobs=${JobCounter.jobs.get - j0} " +
      f"in_job=$inJob%.2fs driver=${math.max(0, dt - inJob)}%.2fs" +
      (if (attr.isEmpty) "" else s" attr=$attr"))
    r
  }

  def main(args: Array[String]): Unit = {
    val exp = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ext.GraftFunctions.register(spark)

    exp match {
      case "k12b_cand" => k12bCand(spark, sfDir)
      case "k12b_verify" => k12bVerify(spark, sfDir)
      case "k12b_verify_enc" => k12bVerifyEnc(spark, sfDir)
      case "k12b_verify_plans" => k12bVerifyPlans(spark, sfDir)
      case "k12b_cand_plans" => k12bCandPlans(spark, sfDir)
      case "l16_dissect" => l16Dissect(spark, sfDir)
      case "op_dissect" => opDissect(spark, sfDir)
      case "scalar_variants" => scalarVariants(spark, sfDir)
      case "cc_jump" => ccJump(spark, sfDir)
      case "sort_child" => sortChild(spark, sfDir)
      case "noop" => ()
    }
    spark.stop()
  }

  /** Write the INTERNAL candidate-stage plans (the stage k12b's top-level
    * explain hides behind checkpoints) as before/after evidence files:
    * before = lshCandidatesOf's join+distinct shape + the downstream size
    * filter, after = fbwCandidates' first-band-wins shape. Both build the
    * LOGICAL plan only (no checkpoint is executed — the builders are
    * re-spelled here up to, not including, their materialization). */
  private def k12bCandPlans(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.execution.ExplainMode
    import graft.core.{Checkpoints, Tables}
    val docs = Tables.documents(spark, dir)
      .withColumn("toks", split(lower(col("text")), " "))
      .select(col("doc_id"), array_distinct(col("toks")).as("ts"))
    val keyed = Checkpoints.eager(docs
      .select(col("doc_id"),
        array_sort(array_distinct(col("ts"))).as("ts"),
        md5(to_json(array_sort(array_distinct(col("ts"))))).as("__k")))
    val reps = Checkpoints.eager(keyed.groupBy(col("__k"))
      .agg(min(col("doc_id")).as("doc_id"), first(col("ts")).as("ts")))
    val repDocs = reps.select(col("doc_id"), col("ts"))
    val tau = math.round(0.8 * 1e6) - 1
    // BEFORE: banding + exact-key self-join + union + distinct + size
    // filter (what lshCandidatesOf + lshClusters' sizeOk did)
    val nHashes = 24; val rowsPerBand = 3; val bucketCap = 4096
    val sigs = repDocs.select(
      col("doc_id"), size(col("ts")).as("__sz"),
      expr(s"graft_minhash_sig(ts, $nHashes)").as("sig"))
    val bands = sigs.select(col("doc_id"), col("__sz"),
      posexplode(expr(s"transform(sequence(0, ${nHashes / rowsPerBand - 1}), " +
        s"b -> slice(sig, b * $rowsPerBand + 1, $rowsPerBand))")))
      .toDF("doc_id", "__sz", "band_id", "band_sig")
    val stats = bands.groupBy(col("band_id"), col("band_sig"))
      .agg(count(lit(1)).as("__n"), min(col("doc_id")).as("__anchor"),
        min_by(col("__sz"), col("doc_id")).as("__anchor_sz"))
      .where(col("__n") >= 2)
    val sized = bands.join(stats, Seq("band_id", "band_sig"))
    val pruned = sized.where(col("__n") <= bucketCap)
      .select(col("band_id"), col("band_sig"), col("doc_id"), col("__sz"))
    val a = pruned.toDF("band_a", "sig_a", "id_a", "sz_a")
    val b = pruned.toDF("band_b", "sig_b", "id_b", "sz_b")
    val fullPairs = a.join(b,
      col("band_a") === col("band_b") && col("sig_a") === col("sig_b")
        && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
    val starPairs = sized.where(col("__n") > bucketCap)
      .where(col("doc_id") =!= col("__anchor"))
      .select(col("__anchor").as("id_a"), col("doc_id").as("id_b"),
        col("__anchor_sz").as("sz_a"), col("__sz").as("sz_b"))
    val before = fullPairs.union(starPairs).distinct()
      .where(col("sz_a").cast("long") * 1000000L >= col("sz_b") * tau &&
        col("sz_b").cast("long") * 1000000L >= col("sz_a") * tau)
      .select(col("id_a"), col("id_b"))
    // AFTER: the shipped fbwCandidates plan, stopped before materialization
    val after = queries.Similarity.fbwCandidatesPlanOnly(repDocs, bucketCap, tau)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/plans/r21/k12b_candidates_stage_before.txt"),
      before.queryExecution.explainString(ExplainMode.fromString("formatted")))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/plans/r21/k12b_candidates_stage_after.txt"),
      after.queryExecution.explainString(ExplainMode.fromString("formatted")))
    println("[lab] wrote candidate-stage plans")
    Checkpoints.release(reps, keyed)
  }

  /** Final-global-sort cost: does materializing the expensive child
    * (window / aggregate) before orderBy beat letting the range sampler
    * re-execute it? */
  private def sortChild(spark: SparkSession, dir: String): Unit = {
    import graft.core.{Checkpoints, Det, Tables}
    import org.apache.spark.sql.expressions.Window
    def force(label: String)(df: => DataFrame): Unit = {
      t(label) { df.write.format("noop").mode("overwrite").save() }
      Checkpoints.releaseAll(spark)
    }
    val fullKey = Seq(col("l_shipdate"), col("l_orderkey"),
      col("l_linenumber"), col("l_extendedprice"))
    val w = Window.partitionBy(col("l_suppkey")).orderBy(fullKey: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def f3body(df: DataFrame) = df
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"), col("l_extendedprice"),
        Det.money(sum(Det.dec2(col("l_extendedprice"))).over(w)).as("running_price"))
    for (rep <- 1 to 2) {
      force(s"f3_A_current_$rep") {
        f3body(Tables.lineitem(spark, dir))
          .orderBy(col("l_suppkey") +: fullKey: _*)
      }
      force(s"f3_B_checkpoint_$rep") {
        Checkpoints.eager(f3body(Tables.lineitem(spark, dir)))
          .orderBy(col("l_suppkey") +: fullKey: _*)
      }
    }
  }

  /** Pointer-jumping CC variant vs the shipped min-propagation loop, on
    * the real k11 (within-cell cosine) and k12b (LSH-verified) graphs. */
  private def ccJump(spark: SparkSession, dir: String): Unit = {
    import graft.core.{Checkpoints, Tables}
    import org.apache.spark.sql.types.{ArrayType, DoubleType => DT}
    // k11-shaped graph: 500 embeddings, 16 cells, cosine >= 0.35 pairs
    val vecs = Tables.embeddings(spark, dir)
      .withColumn("e", col("embedding").cast(ArrayType(DT)))
      .select(col("vec_id"), col("e"))
    val cents = vecs.orderBy(col("vec_id")).limit(16)
      .agg(collect_list(struct(col("vec_id").as("cid"), col("e").as("c"))).as("cs"))
    val assigned = Checkpoints.eager(
      vecs.crossJoin(broadcast(cents))
        .withColumn("cell", expr(
          "(array_max(transform(cs, s -> struct(round(graft_cosine(e, s.c), 6) AS sc, s.cid AS cid)))).cid"))
        .select(col("vec_id"), col("e"), col("cell")))
    val pairs = assigned.select(col("cell"), col("vec_id").as("id_a"), col("e").as("e_a"))
      .join(assigned.select(col("cell"), col("vec_id").as("id_b"), col("e").as("e_b")),
        Seq("cell"))
      .where(col("id_a") < col("id_b"))
      .where(round(expr("graft_cosine(e_a, e_b)"), 6) >= 0.35)
      .select(col("id_a"), col("id_b"))
    val nodes = assigned.select("vec_id")
    for (rep <- 1 to 2) {
      val base = t(s"k11_cc_base_$rep") {
        graft.queries.Similarity.connectedComponents(nodes, pairs) }
      val jump = t(s"k11_cc_jump_$rep") { ccJumpLoop(nodes, pairs) }
      println(s"[lab] k11 label diff: ${jump.except(base).count()} / ${base.except(jump).count()}")
      Checkpoints.release(base, jump)
    }
    Checkpoints.release(assigned)
  }

  /** The jump variant: each round min-reduces over self ∪ neighbor labels
    * ∪ lbl(lbl(v)) — O(log diameter) rounds instead of O(diameter). */
  private def ccJumpLoop(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 50): DataFrame = {
    import graft.core.Checkpoints
    val directed = Checkpoints.eager(edges.toDF("src", "dst"))
    val spark = nodes.sparkSession
    val aqePrev = spark.conf.get("spark.sql.adaptive.enabled")
    val partsPrev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def lblSum(df: DataFrame): Option[Long] =
        Option(df.agg(sum("lbl")).head.get(0)).map(_.asInstanceOf[Number].longValue)
      var labels = Checkpoints.eager(
        nodes.toDF("vec_id").select(col("vec_id"), col("vec_id").as("lbl")))
      var sumv = lblSum(labels)
      if (sumv.isEmpty) { Checkpoints.release(directed); return labels }
      val nEdges = directed.count(); val nNodes = labels.count()
      val sessionParts = partsPrev.toInt
      val loopParts = math.max(1L, math.min(sessionParts.toLong,
        math.max(2 * nEdges, nNodes) / 500000L + 1)).toInt
      spark.conf.set("spark.sql.shuffle.partitions", loopParts)
      val sym = Checkpoints.eager(
        directed.union(directed.select(col("dst").as("src"), col("src").as("dst")))
          .repartition(loopParts, col("dst")))
      Checkpoints.release(directed)
      var converged = false; var rounds = 0
      while (!converged && rounds < maxRounds) {
        val nb = sym.join(labels.withColumnRenamed("vec_id", "dst2"),
            col("dst") === col("dst2"))
          .select(col("src").as("vec_id"), col("lbl"))
        val jump = labels.toDF("v0", "l0")
          .join(labels.toDF("v1", "l1"), col("l0") === col("v1"))
          .select(col("v0").as("vec_id"), col("l1").as("lbl"))
        val next = Checkpoints.eager(
          labels.union(nb).union(jump).groupBy("vec_id").agg(min("lbl").as("lbl")))
        val nextSum = lblSum(next)
        Checkpoints.release(labels)
        labels = next
        converged = nextSum == sumv
        sumv = nextSum
        rounds += 1
      }
      Checkpoints.release(sym)
      println(s"[lab] jump rounds: $rounds")
      labels
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqePrev)
      spark.conf.set("spark.sql.shuffle.partitions", partsPrev)
    }
  }

  /** Time each phase of l16 (streaming CDF -> MV) separately. */
  private def l16Dissect(spark: SparkSession, dir: String): Unit = {
    import graft.tables.GraftTable
    import graft.streaming.StreamOps
    val base = "/tmp/graft_io/l16_cdfmv_base"
    val view = "/tmp/graft_io/l16_cdfmv_view"
    StreamOps.rmrf(base); StreamOps.rmrf(view)
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    tj(spark, "v1_write") { GraftTable.write(spark, o, base, "overwrite") }
    tj(spark, "v2_setprop") { GraftTable.setProperty(base, "changeDataFeed", Some("true")) }
    tj(spark, "v3_updateWhere") { GraftTable.updateWhere(spark, base, "o_orderkey % 100 = 0",
      Map("o_totalprice" -> "o_totalprice * 2")) }
    tj(spark, "v4_deleteWhere") { GraftTable.deleteWhere(spark, base, "o_orderkey % 100 = 50") }
    val upserts = o.where(col("o_orderkey") % 100 === 25)
      .withColumn("o_totalprice", col("o_totalprice") + 1000)
      .unionByName(o.where(col("o_orderkey") % 100 === 75)
        .withColumn("o_orderkey", col("o_orderkey") + 5000000L))
    tj(spark, "v5_merge") { GraftTable.merge(spark, base, upserts, Seq("o_orderkey")) }
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
    tj(spark, "stream_run1_v1to5") { graft.pipeline.PipelineRunner.run(spark, yaml) }
    tj(spark, "v6_updateWhere") { GraftTable.updateWhere(spark, base, "o_orderkey % 100 = 30",
      Map("o_totalprice" -> "o_totalprice + 7")) }
    val out = tj(spark, "stream_run2_replay") { graft.pipeline.PipelineRunner.run(spark, yaml).passed
      .select(col("o_orderstatus"), col("n"), col("n_v"),
        col("sum_v").cast("double").as("sum_v"))
      .orderBy(col("o_orderstatus")) }
    tj(spark, "noop_force") { out.write.format("noop").mode("overwrite").save() }
  }

  /** Phase + JOB census of the remaining heavy lakehouse queries (ep24
    * mv_refresh ladder, ep26 version diff, ep27 conditional CDC merge,
    * a7b bucketed write+join): where the seconds and the Spark jobs go,
    * op by op — the evidence base for VERDICT r21 tasks 3-5. */
  private def opDissect(spark: SparkSession, dir: String): Unit = {
    import graft.core.Tables
    import graft.tables.{GraftTable, MaterializedView}
    def rm(p: String): Unit = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sessionState.newHadoopConf()).delete(hp, true)
    }
    // ---- ep24 mv_refresh ladder --------------------------------------
    val base = "/tmp/graft_lab/mv_base"; val mv = "/tmp/graft_lab/mv_agg"
    rm(base); rm(mv)
    val keys = Seq("o_orderstatus")
    val aggs = Seq(
      MaterializedView.AggSpec("count", "o_orderkey", "n"),
      MaterializedView.AggSpec("sum",
        "CAST(o_totalprice AS DECIMAL(12,2))", "sum_v"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    def slice(r: Int) = o.where(col("o_orderkey") % 3 === r)
    tj(spark, "ep24_v1_write") { GraftTable.write(spark, slice(0), base, "overwrite") }
    tj(spark, "ep24_mv_create") { MaterializedView.refresh(spark, base, mv, keys, aggs) }
    tj(spark, "ep24_v2_append") { GraftTable.write(spark, slice(1), base, "append") }
    tj(spark, "ep24_mv_incr") { MaterializedView.refresh(spark, base, mv, keys, aggs) }
    tj(spark, "ep24_v3_merge") { GraftTable.merge(spark, base,
      slice(0).withColumn("o_totalprice", col("o_totalprice") * 2),
      Seq("o_orderkey")) }
    tj(spark, "ep24_mv_full") { MaterializedView.refresh(spark, base, mv, keys, aggs) }
    tj(spark, "ep24_v4_append") { GraftTable.write(spark, slice(2), base, "append") }
    tj(spark, "ep24_mv_incr2") { MaterializedView.refresh(spark, base, mv, keys, aggs) }
    tj(spark, "ep24_read") { GraftTable.read(spark, mv)
      .orderBy(col("o_orderstatus"))
      .write.format("noop").mode("overwrite").save() }
    // ---- ep26 version diff --------------------------------------------
    val vd = "/tmp/graft_lab/vdiff"
    rm(vd)
    tj(spark, "ep26_v1_write") { GraftTable.write(spark, o, vd, "overwrite") }
    val changes = o.where(col("o_orderkey") % 100 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .unionByName(o.where(col("o_orderkey") % 100 === 50)
        .withColumn("o_orderkey", col("o_orderkey") + 1000000L))
    tj(spark, "ep26_v2_merge") { GraftTable.merge(spark, vd, changes, Seq("o_orderkey")) }
    tj(spark, "ep26_v3_merge_del") { GraftTable.merge(spark, vd,
      o.where(col("o_orderkey") % 100 === 1), Seq("o_orderkey"), "delete") }
    tj(spark, "ep26_diff_read") { graft.pipeline.PipelineRunner.run(spark,
      s"""name: lab_vdiff
         |source: {format: graft_table, path: "$vd", options: {versionAsOf: "1"}}
         |transforms:
         |  - op: diff
         |    on: [o_orderkey]
         |    table: {format: graft_table, path: "$vd", options: {versionAsOf: "3"}}
         |  - {op: sort, cols: [o_orderkey]}
         |""".stripMargin).passed
      .write.format("noop").mode("overwrite").save() }
    // ---- ep27 conditional CDC merge ------------------------------------
    val cdc = "/tmp/graft_lab/cdc"; val cdcCh = "/tmp/graft_lab/cdc_changes"
    rm(cdc); rm(cdcCh)
    tj(spark, "ep27_v1_write") { GraftTable.write(spark, o, cdc, "overwrite") }
    tj(spark, "ep27_changes_parquet") { o.withColumn("o_totalprice",
      when(col("o_orderkey") % 2 === 0, col("o_totalprice") * 2)
        .otherwise(col("o_totalprice") * 0.5))
      .write.mode("overwrite").parquet(cdcCh) }
    tj(spark, "ep27_cond_merge") { GraftTable.merge(spark, cdc,
      spark.read.parquet(cdcCh), Seq("o_orderkey"),
      condition = Some("s.o_totalprice > t.o_totalprice")) }
    tj(spark, "ep27_read") { GraftTable.read(spark, cdc)
      .orderBy(col("o_orderkey"))
      .write.format("noop").mode("overwrite").save() }
    // ---- a7b bucketed write + join -------------------------------------
    spark.sql("DROP TABLE IF EXISTS lab_bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS lab_bkt_orders")
    rm("/tmp/graft_lab/bkt_lineitem"); rm("/tmp/graft_lab/bkt_orders")
    tj(spark, "a7b_write_lineitem") { Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"))
      .repartition(8, col("l_orderkey")) // the shipped write shape
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", "/tmp/graft_lab/bkt_lineitem")
      .saveAsTable("lab_bkt_lineitem") }
    tj(spark, "a7b_write_orders") { Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .repartition(8, col("o_orderkey")) // the shipped write shape
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", "/tmp/graft_lab/bkt_orders")
      .saveAsTable("lab_bkt_orders") }
    tj(spark, "a7b_join") {
      val l = spark.table("lab_bkt_lineitem")
      val ob = spark.table("lab_bkt_orders").hint("merge")
      l.join(ob, l("l_orderkey") === ob("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          graft.core.Det.money(sum(graft.core.Det.dec2(col("l_quantity"))))
            .as("sum_qty"))
        .orderBy(col("o_orderpriority"))
        .write.format("noop").mode("overwrite").save() }
  }

  /** c12 / i4 / b6 alternative formulations, noop-forced, 2 reps each
    * (measured 2026-08-19: c12 Expand 3.6-8.5s vs split 0.8-1.9s; i4
    * project-sort 2.9-4.2 vs sort-project 1.1-1.3; b6 2.4-3.0 vs 0.7-0.9,
    * and b6 without any sort 1.2-1.5 — the pre-sort projection pays twice:
    * once in the range sampler, once wide through the exchange). */
  private def scalarVariants(spark: SparkSession, dir: String): Unit = {
    import graft.core.{Det, Tables}
    import org.apache.spark.sql.types._
    def force(label: String)(df: => DataFrame): Unit = {
      val d = df
      t(label) { d.write.format("noop").mode("overwrite").save() }
    }
    val li = Tables.lineitem(spark, dir)
    for (rep <- 1 to 2) {
      force(s"c12_A_expand_$rep") {
        li.agg(
          count(col("l_quantity")).as("q_n"),
          countDistinct(col("l_quantity")).as("q_d"),
          min(col("l_quantity").cast(LongType)).cast(StringType).as("q_min"),
          max(col("l_quantity").cast(LongType)).cast(StringType).as("q_max"),
          count(col("l_extendedprice")).as("p_n"),
          countDistinct(col("l_extendedprice")).as("p_d"),
          min(Det.dec2(col("l_extendedprice"))).cast(StringType).as("p_min"),
          max(Det.dec2(col("l_extendedprice"))).cast(StringType).as("p_max"),
          count(col("l_returnflag")).as("r_n"),
          countDistinct(col("l_returnflag")).as("r_d"),
          min(col("l_returnflag")).as("r_min"),
          max(col("l_returnflag")).as("r_max"))
          .select(expr(
            """stack(3,
              |  'l_extendedprice', p_n, p_d, p_min, p_max,
              |  'l_quantity', q_n, q_d, q_min, q_max,
              |  'l_returnflag', r_n, r_d, r_min, r_max)
              |AS (col_name, n_nonnull, n_distinct, min_v, max_v)""".stripMargin))
          .orderBy(col("col_name"))
      }
      force(s"c12_B_split_$rep") { queries.Validation.c12.build(spark, dir) }
      def i4proj(df: DataFrame) = df.select(
        col("l_orderkey"), col("l_linenumber"), col("l_shipdate"), col("l_extendedprice"),
        abs(col("l_extendedprice") * -1).as("abs_price"),
        ceil(col("l_extendedprice")).as("ceil_price"),
        floor(col("l_extendedprice")).as("floor_price"),
        round(Det.dec2(col("l_extendedprice")), 1).cast(DoubleType).as("round1"),
        round(sqrt(col("l_quantity")), 6).as("sqrt_qty"),
        round(exp(col("l_discount")), 6).as("exp_disc"),
        round(log(col("l_extendedprice")), 6).as("ln_price"),
        round(log10(col("l_extendedprice")), 6).as("log10_price"),
        round(pow(col("l_quantity"), 1.5), 6).as("qty_pow"),
        pmod(col("l_orderkey"), lit(7)).as("pmod7"),
        signum(col("l_discount") - 0.05).as("sgn"),
        greatest(col("l_quantity"), col("l_discount") * 100).as("gr"),
        least(col("l_quantity"), col("l_discount") * 100).as("le"))
      force(s"i4_A_projsort_$rep") {
        i4proj(li).orderBy(col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate"), col("l_extendedprice"))
      }
      force(s"i4_B_sortproj_$rep") { queries.Scalars.i4.build(spark, dir) }
      val o = Tables.orders(spark, dir)
      def b6proj(df: DataFrame) = df.select(
        col("o_orderkey"),
        col("o_totalprice").cast(DecimalType(18, 2)).cast(DoubleType).as("price_dec"),
        col("o_orderdate").cast(DateType).cast(StringType).as("order_date"),
        expr("try_cast(o_orderstatus AS INT)").as("status_int"),
        col("o_orderkey").cast(StringType).as("okey_str"))
      force(s"b6_A_projsort_$rep") { b6proj(o).orderBy(col("o_orderkey")) }
      force(s"b6_B_sortproj_$rep") { queries.Relational.b6.build(spark, dir) }
      force(s"b6_C_nosort_$rep") { b6proj(o) }
    }
  }

  /** Round-22 task-1 A/B: the verify join over ENCODED token arrays vs
    * the shipped string arrays, including every encode/certificate cost
    * inside the timed window (the honest comparison — the encode runs
    * inside the query). Variants:
    *   A current: string arrays + shuffle_hash + string merge walk.
    *   B certified-hash: ts → array_sort(transform(ts, xxhash64)) — a
    *     map-only encode, made EXACT (not whp) by a runtime injectivity
    *     certificate: count(distinct token) == count(distinct hash) over
    *     the corpus vocabulary proves the hash injective on this corpus,
    *     so |h(A) ∩ h(B)| = |A ∩ B| for every pair. Certificate cost is
    *     timed.
    *   C dictionary: dense int ids via sorted-vocab zipWithIndex + join +
    *     re-collect — exact by construction, costs two extra shuffles of
    *     the token explosion. Encode cost is timed.
    * Pair sets must be identical (except both ways = 0). */
  private def k12bVerifyEnc(spark: SparkSession, dir: String): Unit = {
    import graft.core.{Checkpoints, Tables}
    import org.apache.spark.sql.types.{ArrayType, IntegerType}
    import org.apache.spark.sql.Row
    val docs = Tables.documents(spark, dir)
      .withColumn("toks", split(lower(col("text")), " "))
      .select(col("doc_id"), array_distinct(col("toks")).as("ts"))
    val keyed = Checkpoints.eager(docs
      .select(col("doc_id"),
        array_sort(array_distinct(col("ts"))).as("ts"),
        md5(to_json(array_sort(array_distinct(col("ts"))))).as("__k")))
    val reps = Checkpoints.eager(keyed.groupBy(col("__k"))
      .agg(min(col("doc_id")).as("doc_id"), first(col("ts")).as("ts")))
    val repDocs = reps.select(col("doc_id"), col("ts"))
    val pairs = t("candidates") {
      queries.Similarity.fbwCandidates(repDocs, 4096,
        math.round(0.8 * 1e6) - 1) }
    println(s"[lab] pairs: ${pairs.count()}")
    def jaccard(df: DataFrame): DataFrame = df
      .withColumn("__i", expr("graft_sorted_intersect_size(ts_a, ts_b)"))
      .where(round(col("__i").cast(DoubleType)
        / (size(col("ts_a")) + size(col("ts_b")) - col("__i")), 6) >= 0.8)
      .select(col("id_a"), col("id_b"))
    def verifyWith(sides: DataFrame): DataFrame = jaccard(pairs
      .join(sides.toDF("id_a", "ts_a").hint("shuffle_hash"), "id_a")
      .join(sides.toDF("id_b", "ts_b").hint("shuffle_hash"), "id_b"))
    for (rep <- 1 to 5) {
      // A: shipped
      val vA = t(s"A_strings_$rep") { Checkpoints.eager(verifyWith(repDocs)) }
      println(s"[lab] A edges: ${vA.count()}")
      // B: certificate + map-only hash encode
      val vB = t(s"B_cert_hash_$rep") {
        val Row(nTok: Long, nHash: Long) = repDocs
          .select(explode(col("ts")).as("tok")).distinct()
          .agg(count(lit(1)), count_distinct(xxhash64(col("tok")))).head
        require(nTok == nHash, s"xxhash64 collision on vocab: $nTok != $nHash")
        val enc = repDocs.select(col("doc_id"),
          array_sort(expr("transform(ts, t -> xxhash64(t))")).as("ts"))
        Checkpoints.eager(verifyWith(enc))
      }
      println(s"[lab] B edges: ${vB.count()}; diff vs A: " +
        s"${vB.except(vA).count()} / ${vA.except(vB).count()}")
      Checkpoints.release(vB)
      // C: dictionary encode (dense ints), encode timed apart
      val enc = t(s"C_encode_$rep") {
        // the SHIPPED encode (Similarity.dictEncodePlan) so the A/B
        // measures the production shape, not a drifted copy
        Checkpoints.eager(queries.Similarity.dictEncodePlan(repDocs))
      }
      val vC = t(s"C_dict_verify_$rep") { Checkpoints.eager(verifyWith(enc)) }
      println(s"[lab] C edges: ${vC.count()}; diff vs A: " +
        s"${vC.except(vA).count()} / ${vA.except(vC).count()}")
      Checkpoints.release(vC, vA, enc)
    }
    Checkpoints.release(pairs, reps, keyed)
  }

  /** Write the verify-stage plans (string arrays vs dictionary ints) as
    * round-22 before/after evidence. Logical-plan only up to the encode
    * checkpoint, which must exist for the after-plan to resolve. */
  private def k12bVerifyPlans(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.execution.ExplainMode
    import org.apache.spark.sql.types.{ArrayType, IntegerType}
    import org.apache.spark.sql.Row
    import graft.core.{Checkpoints, Tables}
    val docs = Tables.documents(spark, dir)
      .withColumn("toks", split(lower(col("text")), " "))
      .select(col("doc_id"), array_distinct(col("toks")).as("ts"))
    val keyed = Checkpoints.eager(docs
      .select(col("doc_id"),
        array_sort(array_distinct(col("ts"))).as("ts"),
        md5(to_json(array_sort(array_distinct(col("ts"))))).as("__k")))
    val reps = Checkpoints.eager(keyed.groupBy(col("__k"))
      .agg(min(col("doc_id")).as("doc_id"), first(col("ts")).as("ts")))
    val repDocs = reps.select(col("doc_id"), col("ts"))
    val pairs = queries.Similarity.fbwCandidates(repDocs, 4096,
      math.round(0.8 * 1e6) - 1)
    def verifyWith(sides: DataFrame): DataFrame = pairs
      .join(sides.toDF("id_a", "ts_a").hint("shuffle_hash"), "id_a")
      .join(sides.toDF("id_b", "ts_b").hint("shuffle_hash"), "id_b")
      .withColumn("__i", expr("graft_sorted_intersect_size(ts_a, ts_b)"))
      .where(round(col("__i").cast(DoubleType)
        / (size(col("ts_a")) + size(col("ts_b")) - col("__i")), 6) >= 0.8)
      .select(col("id_a"), col("id_b"))
    val before = verifyWith(repDocs)
    val encDocs = Checkpoints.eager(
      queries.Similarity.dictEncodePlan(repDocs)) // the shipped encode
    val after = verifyWith(encDocs)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/root/repo/plans/r22"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/plans/r22/k12b_verify_stage_before.txt"),
      before.queryExecution.explainString(ExplainMode.fromString("formatted")) +
        s"\n-- verify build side schema: ${repDocs.schema.simpleString}\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/plans/r22/k12b_verify_stage_after.txt"),
      after.queryExecution.explainString(ExplainMode.fromString("formatted")) +
        s"\n-- verify build side schema: ${encDocs.schema.simpleString}\n")
    println("[lab] wrote verify-stage plans")
    Checkpoints.release(encDocs, pairs, reps, keyed)
  }

  /** Verify-join strategy A/B over the real candidate set. */
  private def k12bVerify(spark: SparkSession, dir: String): Unit = {
    import graft.core.{Checkpoints, Tables}
    val docs = Tables.documents(spark, dir)
      .withColumn("toks", split(lower(col("text")), " "))
      .select(col("doc_id"), array_distinct(col("toks")).as("ts"))
    val keyed = Checkpoints.eager(docs
      .select(col("doc_id"),
        array_sort(array_distinct(col("ts"))).as("ts"),
        md5(to_json(array_sort(array_distinct(col("ts"))))).as("__k")))
    val reps = Checkpoints.eager(keyed.groupBy(col("__k"))
      .agg(min(col("doc_id")).as("doc_id"), first(col("ts")).as("ts")))
    val repDocs = reps.select(col("doc_id"), col("ts"))
    val pairs = t("candidates") {
      queries.Similarity.fbwCandidates(repDocs, 4096,
        math.round(0.8 * 1e6) - 1) }
    println(s"[lab] pairs: ${pairs.count()}")
    def verify(hint: String): DataFrame = pairs
      .join(repDocs.toDF("id_a", "ts_a").hint(hint), "id_a")
      .join(repDocs.toDF("id_b", "ts_b").hint(hint), "id_b")
      .withColumn("__i", expr("graft_sorted_intersect_size(ts_a, ts_b)"))
      .where(round(col("__i").cast(DoubleType)
        / (size(col("ts_a")) + size(col("ts_b")) - col("__i")), 6) >= 0.8)
      .select(col("id_a"), col("id_b"))
    // nowalk: same joins/shuffles, intersect replaced by a free size read
    // (WRONG result — isolates the join machinery from the merge walk)
    def verifyNoWalk(): DataFrame = pairs
      .join(repDocs.toDF("id_a", "ts_a").hint("shuffle_hash"), "id_a")
      .join(repDocs.toDF("id_b", "ts_b").hint("shuffle_hash"), "id_b")
      .withColumn("__i", size(col("ts_a")))
      .where(round(col("__i").cast(DoubleType)
        / (size(col("ts_a")) + size(col("ts_b")) - col("__i")), 6) >= 0.8)
      .select(col("id_a"), col("id_b"))
    // MEASURED 2026-08-19 (warm reps, steal-bracketed): shuffle_hash 1.99s,
    // nowalk 1.49s (the string merge walk itself is ~0.5s), broadcast
    // 9.3-12.7s (per-probe row copies of the 1KB arrays dominate), and a
    // sorted-xxhash64-long-array variant measured 1.83s — within noise of
    // strings, NOT worth trading provable exactness for (reverted). The
    // bench's larger verify_force readings are checkpoint write + codegen
    // + allocator weather, not the join plan.
    for (rep <- 1 to 2) {
      for (hint <- Seq("shuffle_hash", "broadcast")) {
        val v = t(s"verify_${hint}_$rep") { Checkpoints.eager(verify(hint)) }
        println(s"[lab] $hint edges: ${v.count()}")
        Checkpoints.release(v)
      }
      val nw = t(s"verify_nowalk_$rep") { Checkpoints.eager(verifyNoWalk()) }
      println(s"[lab] nowalk rows (WRONG, timing only): ${nw.count()}")
      Checkpoints.release(nw)
    }
    Checkpoints.release(pairs, reps, keyed)
  }

  /** Dissect lshCandidatesOf at sf0.1 exactly as k12b drives it. */
  private def k12bCand(spark: SparkSession, dir: String): Unit = {
    import graft.core.{Checkpoints, Tables}
    val docs = Tables.documents(spark, dir)
      .withColumn("toks", split(lower(col("text")), " "))
      .select(col("doc_id"), array_distinct(col("toks")).as("ts"))
    val keyed = t("collapse_keys") { Checkpoints.eager(docs
      .select(col("doc_id"),
        array_sort(array_distinct(col("ts"))).as("ts"),
        md5(to_json(array_sort(array_distinct(col("ts"))))).as("__k"))) }
    val reps = t("reps") { Checkpoints.eager(keyed.groupBy(col("__k"))
      .agg(min(col("doc_id")).as("doc_id"), first(col("ts")).as("ts"))) }
    val repDocs = reps.select(col("doc_id"), col("ts"))
    val nHashes = 24; val rowsPerBand = 3; val bucketCap = 4096
    val sigs = repDocs.select(
      col("doc_id"), size(col("ts")).as("__sz"),
      expr(s"graft_minhash_sig(ts, $nHashes)").as("sig"))
    val bands = t("bands_checkpoint") { Checkpoints.eager(
      sigs.select(col("doc_id"), col("__sz"),
        posexplode(expr(s"transform(sequence(0, ${nHashes / rowsPerBand - 1}), " +
          s"b -> slice(sig, b * $rowsPerBand + 1, $rowsPerBand))")))
      .toDF("doc_id", "__sz", "band_id", "band_sig")) }
    println(s"[lab] bands rows: ${bands.count()}")
    val stats = bands.groupBy(col("band_id"), col("band_sig"))
      .agg(count(lit(1)).as("__n"), min(col("doc_id")).as("__anchor"),
        min_by(col("__sz"), col("doc_id")).as("__anchor_sz"))
      .where(col("__n") >= 2)
    t("bucket_histogram") {
      stats.groupBy(col("__n")).count().orderBy(col("__n").desc)
        .show(20, false)
    }
    val sized = t("sized_checkpoint") { Checkpoints.eager(bands.join(stats, Seq("band_id", "band_sig"))) }
    val pruned = sized.where(col("__n") <= bucketCap)
      .select(col("band_id"), col("band_sig"), col("doc_id"), col("__sz"))
    val a = pruned.toDF("band_a", "sig_a", "id_a", "sz_a")
    val b = pruned.toDF("band_b", "sig_b", "id_b", "sz_b")
    val fullPairs = a.join(b,
      col("band_a") === col("band_b") && col("sig_a") === col("sig_b")
        && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
    val starPairs = sized.where(col("__n") > bucketCap)
      .where(col("doc_id") =!= col("__anchor"))
      .select(col("__anchor").as("id_a"), col("doc_id").as("id_b"),
        col("__anchor_sz").as("sz_a"), col("__sz").as("sz_b"))
    val tau = math.round(0.8 * 1e6) - 1
    if (sys.env.contains("LAB_ALL")) {
      // A: current shape — join + union + distinct, materialized
      val outA = t("A_join_union_distinct_checkpoint") {
        Checkpoints.eager(fullPairs.union(starPairs).distinct()) }
      println(s"[lab] A distinct pairs: ${outA.count()}")
      val sizeOkA = outA
        .where(col("sz_a").cast("long") * 1000000L >= col("sz_b") * tau &&
          col("sz_b").cast("long") * 1000000L >= col("sz_a") * tau)
      println(s"[lab] A sizeOk pairs: ${t("A_sizeok_count")(sizeOkA.count())}")
      Checkpoints.release(outA)
    }
    val starPairsF = starPairs
      .where(col("sz_a").cast("long") * 1000000L >= col("sz_b") * tau &&
        col("sz_b").cast("long") * 1000000L >= col("sz_a") * tau)

    // C: single-long hashed band key for the self-join + size filter first
    val prunedH = sized.where(col("__n") <= bucketCap)
      .select(xxhash64(col("band_id"), col("band_sig")).as("bk"),
        col("doc_id"), col("__sz"))
    val ah = prunedH.toDF("bk_a", "id_a", "sz_a")
    val bh = prunedH.toDF("bk_b", "id_b", "sz_b")
    val fullPairsH = ah.join(bh,
      col("bk_a") === col("bk_b") && col("id_a") < col("id_b"))
      .where(col("sz_a").cast("long") * 1000000L >= col("sz_b") * tau &&
        col("sz_b").cast("long") * 1000000L >= col("sz_a") * tau)
      .select(col("id_a"), col("id_b"))
    val outC = t("C_hashedkey_sizefilter_distinct_checkpoint") {
      Checkpoints.eager(fullPairsH.union(
        starPairsF.select(col("id_a"), col("id_b"))).distinct()) }
    println(s"[lab] C pairs: ${outC.count()}")

    // D: hashed band keys + FIRST-BAND-WINS dedup (no distinct at all):
    // each doc carries its per-band hashed keys array; a pair is emitted
    // only at the first band whose keys match, so output rows are unique
    // by construction. Unrolled earlier-band checks stay codegen.
    val nBands = nHashes / rowsPerBand
    val sigsD = repDocs.select(
      col("doc_id"), size(col("ts")).as("__sz"),
      expr(s"transform(sequence(0, ${nBands - 1}), " +
        s"b -> xxhash64(b, slice(graft_minhash_sig(ts, $nHashes), b * $rowsPerBand + 1, $rowsPerBand)))").as("bks"))
    val bandsD = t("D_bands_checkpoint") { Checkpoints.eager(
      sigsD.select(col("doc_id"), col("__sz"), col("bks"),
        posexplode(col("bks"))).toDF("doc_id", "__sz", "bks", "band_id", "bk")) }
    val statsD = bandsD.groupBy(col("bk"))
      .agg(count(lit(1)).as("__n"), min(col("doc_id")).as("__anchor"),
        min_by(col("__sz"), col("doc_id")).as("__anchor_sz"))
      .where(col("__n") >= 2)
    val sizedD = bandsD.join(statsD, Seq("bk"))
    val prunedD = sizedD.where(col("__n") <= bucketCap)
      .select(col("bk"), col("band_id"), col("doc_id"), col("__sz"), col("bks"))
    val ad = prunedD.toDF("bk_a", "band_id", "id_a", "sz_a", "bks_a")
    val bd = prunedD.select(col("bk"), col("doc_id"), col("__sz"), col("bks"))
      .toDF("bk_b", "id_b", "sz_b", "bks_b")
    val noEarlier = (0 until nBands - 1).map(i =>
      col("band_id") <= i || element_at(col("bks_a"), i + 1) =!=
        element_at(col("bks_b"), i + 1)).reduce(_ && _)
    val fullPairsD = ad.join(bd, col("bk_a") === col("bk_b") &&
        col("id_a") < col("id_b"))
      .where(noEarlier)
      .where(col("sz_a").cast("long") * 1000000L >= col("sz_b") * tau &&
        col("sz_b").cast("long") * 1000000L >= col("sz_a") * tau)
      .select(col("id_a"), col("id_b"))
    val starPairsD = sizedD.where(col("__n") > bucketCap)
      .where(col("doc_id") =!= col("__anchor"))
      .select(col("__anchor").as("id_a"), col("doc_id").as("id_b"))
    val outD = t("D_firstband_checkpoint") {
      Checkpoints.eager(fullPairsD.union(starPairsD)) }
    println(s"[lab] D pairs: ${outD.count()}")
    println(s"[lab] D==C set: ${outD.except(outC).count()} extra, ${outC.except(outD).count()} missing")
    Checkpoints.release(outC)

    // E: verify join — shuffle_hash (current) vs broadcast of the tiny
    // collapsed rep side (scale-adaptive: reps is known-small here).
    def verify(pairs: DataFrame, hint: String): DataFrame = pairs
      .join(repDocs.toDF("id_a", "ts_a").hint(hint), "id_a")
      .join(repDocs.toDF("id_b", "ts_b").hint(hint), "id_b")
      .withColumn("__i", expr("graft_sorted_intersect_size(ts_a, ts_b)"))
      .where(round(col("__i").cast(DoubleType)
        / (size(col("ts_a")) + size(col("ts_b")) - col("__i")), 6) >= 0.8)
      .select(col("id_a"), col("id_b"))
    val vSh = t("E_verify_shuffle_hash") {
      Checkpoints.eager(verify(outD, "shuffle_hash")) }
    println(s"[lab] E shuffle_hash edges: ${vSh.count()}")
    Checkpoints.release(vSh)
    val vBc = t("E_verify_broadcast") {
      Checkpoints.eager(verify(outD, "broadcast")) }
    println(s"[lab] E broadcast edges: ${vBc.count()}")
    Checkpoints.release(vBc, outD, sizedD, bandsD)
    Checkpoints.release(sized, bands, reps, keyed)
  }
}
