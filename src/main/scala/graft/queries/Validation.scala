package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** SURVEY.md §2.C — validation checks ("customisable validation", the
  * reference's core domain). Each check is a per-row boolean; the two
  * consumers are the quarantine split (§2.B5) and the aggregated metrics
  * row per check (check_name, pass_cnt, fail_cnt).
  *
  * Scale: metrics are computed in ONE pass over the table — all check
  * predicates are evaluated as projected columns inside a single
  * aggregate (map-side partial agg → tiny shuffle), never one job per
  * check. At 100 TB this is a single scan regardless of check count.
  */
object Validation extends QueryPack {
  import QueryDef._

  /** The §2.B5 split predicate, shared by b5_split_pass/quarantine. */
  private def splitPred: Column =
    col("l_discount").between(0, 0.1) && (col("l_quantity") > 0)

  def splitLineitem(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
    // sort covers every projected column — (l_orderkey, l_linenumber) is
    // not unique in the synthetic data (see Windows.fullKey note).
    val ord = Seq(col("l_orderkey"), col("l_linenumber"),
      col("l_quantity"), col("l_discount"))
    (li.where(splitPred).orderBy(ord: _*), li.where(!splitPred).orderBy(ord: _*))
  }

  /** One row per check, computed in a single scan. Spark side evaluates
    * every predicate in one agg; the oracle mirrors with COUNT(CASE). */
  val cMetrics: QueryDef = {
    // (name, spark predicate, duckdb predicate) — kept side by side so the
    // two dialects cannot drift.
    val checks: Seq[(String, Column, String)] = Seq(
      ("c1_not_null_orderkey", col("l_orderkey").isNotNull,
        "l_orderkey IS NOT NULL"),
      ("c2_range_discount", col("l_discount").between(0, 0.1),
        "l_discount BETWEEN 0 AND 0.1"),
      ("c3_set_returnflag", col("l_returnflag").isin("A", "N", "R"),
        "l_returnflag IN ('A','N','R')"),
      ("c4_regex_linestatus", col("l_linestatus").rlike("^[OF]$"),
        "regexp_matches(l_linestatus, '^[OF]$')"),
      ("c5_strlen_shipmode", length(col("l_returnflag")).between(1, 1),
        "length(l_returnflag) BETWEEN 1 AND 1"),
      ("c8_cross_column", col("l_extendedprice") >= col("l_quantity"),
        "l_extendedprice >= l_quantity"))
    val oracleRows = checks.map { case (n, _, p) =>
      s"""SELECT '$n' AS check_name,
         |  COUNT(CASE WHEN $p THEN 1 END) AS pass_cnt,
         |  COUNT(CASE WHEN NOT ($p) THEN 1 END) AS fail_cnt
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY check_name")
    m("c_metrics", oracleRows) { (spark, dir) =>
      val li = Tables.lineitem(spark, dir)
      // single pass: one aggregate producing 2 columns per check, then
      // unpivoted to (check_name, pass_cnt, fail_cnt) rows driver-side of
      // the plan (stack over a 1-row frame — no extra scan).
      val aggCols = checks.flatMap { case (n, p, _) =>
        Seq(count(when(p, lit(1))).as(s"${n}__pass"),
          count(when(!p, lit(1))).as(s"${n}__fail"))
      }
      val one = li.agg(aggCols.head, aggCols.tail: _*)
      val stackArgs = checks.map { case (n, _, _) =>
        s"'$n', `${n}__pass`, `${n}__fail`"
      }.mkString(", ")
      one.select(expr(
        s"stack(${checks.size}, $stackArgs) AS (check_name, pass_cnt, fail_cnt)"))
        .orderBy(col("check_name"))
    }
  }

  /** §2.C6 — uniqueness: keys appearing more than once. */
  val c6: QueryDef = m(
    "c6_unique_violations",
    """SELECT l_orderkey, COUNT(*) AS dup_cnt FROM lineitem
      |GROUP BY l_orderkey HAVING COUNT(*) > 1
      |ORDER BY l_orderkey""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("dup_cnt"))
      .where(col("dup_cnt") > 1)
      .orderBy(col("l_orderkey"))
  }

  /** §2.C7 — referential integrity: lineitem orphans w.r.t. orders.
    * left_anti shuffles on the key; at scale AQE handles skew. */
  val c7: QueryDef = m(
    "c7_referential_orphans",
    """SELECT l_orderkey, l_linenumber FROM lineitem l
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
      .select(col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** §2.C9 — freshness: dataset-level recency check on events. */
  val c9: QueryDef = m(
    "c9_freshness",
    """SELECT MAX(CAST(ts AS TIMESTAMP)) AS max_ts,
      |  MAX(CAST(ts AS TIMESTAMP)) >= TIMESTAMP '2024-01-01 00:00:00' AS is_fresh
      |FROM events""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .agg(max(col("event_ts")).as("max_ts"),
        (max(col("event_ts")) >= Tables.tsLit("2024-01-01 00:00:00")).as("is_fresh"))
  }

  /** §2.C10 — row-count expectation (dataset-level). */
  val c10: QueryDef = m(
    "c10_rowcount",
    """SELECT COUNT(*) AS n_rows,
      |  COUNT(*) BETWEEN 100 AND 100000000 AS within_bounds
      |FROM lineitem""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .agg(count(lit(1)).as("n_rows"),
        count(lit(1)).between(100, 100000000L).as("within_bounds"))
  }

  /** §2.C11 — table fingerprint: per-row md5 over canonicalized columns,
    * rolled up as (count, min, max) — order-independent, drift-detecting.
    * Doubles are canonicalized through BIGINT (quantity is integral) so no
    * engine-specific float→string formatting enters the hash. */
  val c11: QueryDef = m(
    "c11_checksum",
    """SELECT COUNT(*) AS n_rows, MIN(row_md5) AS min_md5, MAX(row_md5) AS max_md5
      |FROM (
      |  SELECT md5(concat_ws('|',
      |    CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
      |    CAST(CAST(l_quantity AS BIGINT) AS VARCHAR),
      |    l_returnflag, l_linestatus)) AS row_md5
      |  FROM lineitem
      |) t""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.types._
    Tables.lineitem(spark, dir)
      .select(md5(concat_ws("|",
        col("l_orderkey").cast(StringType),
        col("l_linenumber").cast(StringType),
        col("l_quantity").cast(LongType).cast(StringType),
        col("l_returnflag"), col("l_linestatus"))).as("row_md5"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("row_md5")).as("min_md5"),
        max(col("row_md5")).as("max_md5"))
  }

  /** §2.C12 — per-column profiling summary (the `describe` a data-quality
    * platform reports): non-null count, exact distinct count, canonical
    * min/max. Min/max are canonicalized before stringification (integral
    * doubles → BIGINT, money → DECIMAL(12,2)) so no engine-specific float
    * formatting enters the comparison — same rule as c11.
    *
    * Plan shape (round-21 remeasure): one wide aggregate with N exact
    * COUNT DISTINCTs plans as an Expand — every row replicated ×(N+1)
    * through the exchange, with the other columns nulled per replica —
    * and measured 3.6-8.5 s at sf0.1. The shipped shape instead profiles
    * each column via groupBy(value) → 1-row roll-up: the partial hash
    * aggregate dedups BEFORE the exchange (for low-cardinality columns
    * the shuffle collapses to ~distinct values; for near-unique columns
    * it shuffles what Expand's distinct branch shuffled anyway — never
    * more), non-null/min/max ride the same pass, and the three 1-row
    * results cross-join for the stack. Measured 0.8 s — same values,
    * same schema (coalesce pins the all-null-column corner to COUNT's 0).
    * Scale note: per-column passes scan the (column-pruned) input N times
    * where Expand scanned once ×N width — at 100 TB both are one-scan-
    * per-column-equivalent in bytes, and the 100-TB profile swaps in
    * approx_count_distinct (HLL, pure map-side merge) regardless. */
  val c12: QueryDef = m(
    "c12_profile_summary",
    """SELECT col_name, n_nonnull, n_distinct, min_v, max_v FROM (
      |  SELECT 'l_quantity' AS col_name, COUNT(l_quantity) AS n_nonnull,
      |    COUNT(DISTINCT l_quantity) AS n_distinct,
      |    CAST(MIN(CAST(l_quantity AS BIGINT)) AS VARCHAR) AS min_v,
      |    CAST(MAX(CAST(l_quantity AS BIGINT)) AS VARCHAR) AS max_v
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'l_extendedprice', COUNT(l_extendedprice),
      |    COUNT(DISTINCT l_extendedprice),
      |    CAST(MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR),
      |    CAST(MAX(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'l_returnflag', COUNT(l_returnflag),
      |    COUNT(DISTINCT l_returnflag), MIN(l_returnflag), MAX(l_returnflag)
      |  FROM lineitem
      |) ORDER BY col_name""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.types._
    val li = Tables.lineitem(spark, dir)
    // one column's profile: groupBy(value) dedups map-side, the roll-up
    // derives every stat from the ≤|distinct| grouped rows. COUNT(col) ≡
    // coalesce(Σ per-value counts over non-null values, 0); COUNT(DISTINCT
    // col) ≡ count of non-null groups; min/max ignore the null group like
    // the direct aggregate does.
    def prof(value: org.apache.spark.sql.Column, canon: org.apache.spark.sql.Column,
             p: String) =
      li.groupBy(value.as("__v")).agg(
          count(lit(1)).as("__c"), min(canon).as("__mn"), max(canon).as("__mx"))
        .agg(
          coalesce(sum(when(col("__v").isNotNull, col("__c"))), lit(0L)).as(s"${p}_n"),
          count(when(col("__v").isNotNull, lit(1))).as(s"${p}_d"),
          min(col("__mn")).cast(StringType).as(s"${p}_min"),
          max(col("__mx")).cast(StringType).as(s"${p}_max"))
    prof(col("l_quantity"), col("l_quantity").cast(LongType), "q")
      .crossJoin(prof(col("l_extendedprice"),
        graft.core.Det.dec2(col("l_extendedprice")), "p"))
      .crossJoin(prof(col("l_returnflag"), col("l_returnflag"), "r"))
      .select(expr(
        """stack(3,
          |  'l_extendedprice', p_n, p_d, p_min, p_max,
          |  'l_quantity', q_n, q_d, q_min, q_max,
          |  'l_returnflag', r_n, r_d, r_min, r_max)
          |AS (col_name, n_nonnull, n_distinct, min_v, max_v)""".stripMargin))
      .orderBy(col("col_name"))
  }

  override def defs: Seq[QueryDef] = Seq(cMetrics, c6, c7, c9, c10, c11, c12)
}
