package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.core.Det._

/** SURVEY.md §2.E — aggregation.
  *
  * Scale: all of these are two-phase hash aggregates (map-side partial →
  * final on the shuffled key) planned by Catalyst; the shuffle carries
  * only (key, partial-state), never raw rows. countDistinct expands to
  * a two-shuffle Expand plan — exact but heavier, which is why E5 ships
  * the approx_count_distinct/HLL path for 100 TB cardinalities.
  */
object Aggregates extends QueryPack {
  import QueryDef._

  /** §2.E1 — grouped hash aggregate: sum/count/min/max. */
  val e1: QueryDef = m(
    "e1_hash_agg",
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       |  ${oMoney(s"SUM(${oDec2("o_totalprice")})")} AS sum_price,
       |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
       |FROM orders
       |GROUP BY o_orderstatus, o_orderpriority
       |ORDER BY o_orderstatus, o_orderpriority""".stripMargin) { (spark, dir) =>
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        money(sum(dec2(col("o_totalprice")))).as("sum_price"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
  }

  /** §2.E2 — global (no-group) aggregate. */
  val e2: QueryDef = m(
    "e2_global_agg",
    s"""SELECT COUNT(*) AS n_rows,
       |  ${oMoney(s"SUM(${oDec2("l_extendedprice")})")} AS sum_price,
       |  MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
       |FROM lineitem""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .agg(count(lit(1)).as("n_rows"),
        money(sum(dec2(col("l_extendedprice")))).as("sum_price"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))
  }

  /** §2.E3 — deterministic average (decimal sum / count, D-rule 3). */
  val e3: QueryDef = m(
    "e3_avg",
    s"""SELECT n_name,
       |  ${oAvg2(s"SUM(${oDec2("c_acctbal")})", "COUNT(c_acctbal)")} AS avg_acctbal,
       |  COUNT(*) AS n_cust
       |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
       |GROUP BY n_name
       |ORDER BY n_name""".stripMargin) { (spark, dir) =>
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(avg2(sum(dec2(col("c_acctbal"))), count(col("c_acctbal"))).as("avg_acctbal"),
        count(lit(1)).as("n_cust"))
      .orderBy(col("n_name"))
  }

  /** §2.E4 — exact distinct counts (single and multi-column). */
  val e4: QueryDef = m(
    "e4_count_distinct",
    """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_custs,
      |  COUNT(DISTINCT CAST(o_custkey AS VARCHAR) || '|' || o_orderpriority) AS n_cust_prio,
      |  COUNT(*) AS n_rows
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_custs"),
        countDistinct(concat(col("o_custkey").cast(StringType), lit("|"),
          col("o_orderpriority"))).as("n_cust_prio"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("o_orderstatus"))
  }

  /** §2.E5 — approx distinct (HLL++): X-tier — sketch differs from
    * DuckDB's; property-tested in AggregatesSpec instead. Emitted so the
    * driver at least row-checks it. */
  val e5: QueryDef = x("e5_approx_distinct") { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .orderBy(col("event_type"))
  }

  /** §2.E6 — rollup with grouping_id (multi-level subtotals). */
  val e6: QueryDef = m(
    "e6_rollup",
    s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       |  COALESCE(o_orderpriority, 'ALL') AS priority,
       |  GROUPING(o_orderstatus, o_orderpriority) AS gid,
       |  COUNT(*) AS n, ${oMoney(s"SUM(${oDec2("o_totalprice")})")} AS sum_price
       |FROM orders
       |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
       |ORDER BY gid, status, priority""".stripMargin) { (spark, dir) =>
    Tables.orders(spark, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        money(sum(dec2(col("o_totalprice")))).as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("gid"), col("n"), col("sum_price"))
      .orderBy(col("gid"), col("status"), col("priority"))
  }

  /** §2.E7 — collect per-group values: sorted then serialized to a string
    * (never compare raw arrays cross-engine — D-rule 6 analogue). */
  val e7: QueryDef = m(
    "e7_collect_list",
    """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
      |FROM nation
      |GROUP BY n_regionkey
      |ORDER BY n_regionkey""".stripMargin) { (spark, dir) =>
    Tables.nation(spark, dir)
      .groupBy(col("n_regionkey"))
      .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("names"))
      .orderBy(col("n_regionkey"))
  }

  /** §2.E8 — pivot: event_type rows → count columns. */
  val e8: QueryDef = m(
    "e8_pivot",
    """SELECT user_id % 10 AS bucket,
      |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
      |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
      |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
      |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
      |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
      |FROM events
      |GROUP BY user_id % 10
      |ORDER BY bucket""".stripMargin) { (spark, dir) =>
    val types = Seq("view", "click", "purchase", "signup", "error")
    val piv = Tables.events(spark, dir)
      .groupBy((col("user_id") % 10).as("bucket"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0, types)
    piv.select(col("bucket") +: types.map(t => col(t).as(s"n_$t")): _*)
      .orderBy(col("bucket"))
  }

  /** §2.E9 — unpivot columns → rows (stack ≡ UNION ALL form). Values are
    * raw double pass-throughs — bit-identical with no arithmetic. */
  val e9: QueryDef = m(
    "e9_unpivot",
    """SELECT l_orderkey, l_linenumber, 'discount' AS measure, l_discount AS val FROM lineitem
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'quantity', l_quantity FROM lineitem
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, measure, val""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("stack(3, 'discount', l_discount, 'quantity', l_quantity, 'tax', l_tax) AS (measure, val)"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"), col("val"))
  }

  /** §2.E10 — deterministic-seed sampling: X-tier (engine RNGs differ);
    * seed-stability is property-tested in AggregatesSpec. */
  val e10: QueryDef = x("e10_sample") { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .sample(withReplacement = false, fraction = 0.1, seed = 42L)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** §2.E11 — exact percentiles (median + quartiles) per group. Spark's
    * `percentile` and DuckDB's `quantile_cont` both linear-interpolate
    * over the sorted values; results round to 4 dp so last-ulp
    * interpolation drift cannot flip the hash. Scale note: EXACT
    * percentiles buffer each group's values — right for bounded groups
    * (here: 3 flags); for 100-TB ungrouped quantiles use
    * `approx_percentile` (t-digest sketch, mergeable map-side). */
  val e11: QueryDef = m(
    "e11_percentiles",
    """SELECT l_returnflag,
      |  ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
      |  ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
      |  ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      // ONE buffered percentile aggregate for all three cut points (the
      // array form shares the per-group value buffer; three scalar calls
      // ran three ObjectHashAggregates — measured 3x slower)
      .agg(
        expr("percentile(l_extendedprice, array(0.25D, 0.50D, 0.75D))").as("ps"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        round(element_at(col("ps"), 1), 4).as("p25"),
        round(element_at(col("ps"), 2), 4).as("p50"),
        round(element_at(col("ps"), 3), 4).as("p75"),
        col("n"))
      .orderBy(col("l_returnflag"))
  }

  /** §2.E12 — second-moment statistics (stddev/variance/correlation/
    * covariance), the profiling battery a data-quality platform reports.
    * All are one-pass co-moment aggregates (partition-mergeable — no
    * second scan at any scale); 4-dp rounding absorbs the ~1e-10-relative
    * accumulation-order drift doubles allow. */
  val e12: QueryDef = m(
    "e12_stats",
    """SELECT event_type,
      |  ROUND(stddev_samp(value), 4) AS sd_value,
      |  ROUND(var_samp(value), 4) AS var_value,
      |  ROUND(corr(value, CAST(user_id AS DOUBLE)), 4) AS corr_vu,
      |  ROUND(covar_samp(value, CAST(user_id AS DOUBLE)), 4) AS cov_vu
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        round(stddev_samp(col("value")), 4).as("sd_value"),
        round(var_samp(col("value")), 4).as("var_value"),
        round(corr(col("value"), col("user_id").cast("double")), 4).as("corr_vu"),
        round(covar_samp(col("value"), col("user_id").cast("double")), 4).as("cov_vu"))
      .orderBy(col("event_type"))
  }

  /** §2.E10b — STRATIFIED sampling (per-class fractions): the training-
    * data balancing primitive (downsample the majority class, keep the
    * rare ones). X-tier like e10 (engine RNGs differ); seed stability and
    * per-stratum bounds are spec-tested. Map-side only — no shuffle. */
  val e10b: QueryDef = x("e10b_stratified_sample") { (spark, dir) =>
    Tables.events(spark, dir)
      .stat.sampleBy("event_type",
        Map("view" -> 0.05, "click" -> 0.2, "purchase" -> 1.0,
            "signup" -> 1.0, "error" -> 1.0),
        42L)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  /** §2.E11b — the 100-TB percentile path e11's Scaladoc names: a t-digest
    * sketch (`approx_percentile`) — bounded memory per group, mergeable
    * map-side, no value buffering. X-tier (sketch internals are
    * engine-specific); SimilarityOpsSpec bounds the error against e11's
    * exact quartiles. */
  val e11b: QueryDef = x("e11b_approx_percentiles") { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr(
        "approx_percentile(l_extendedprice, array(0.25D, 0.50D, 0.75D), 1000)")
        .as("ps"))
      .select(col("l_returnflag"),
        round(element_at(col("ps"), 1), 4).as("p25"),
        round(element_at(col("ps"), 2), 4).as("p50"),
        round(element_at(col("ps"), 3), 4).as("p75"))
      .orderBy(col("l_returnflag"))
  }

  override def defs: Seq[QueryDef] =
    Seq(e1, e2, e3, e4, e5, e6, e7, e8, e9, e10, e10b, e11, e11b, e12)
}
