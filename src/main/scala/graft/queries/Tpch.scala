package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Det._
import graft.core.Tables

/** Composite analytic workloads — the classic TPC-H join/agg shapes
  * (Q3/Q5/Q6/Q7/Q8/Q10/Q13/Q14/Q15/Q17/Q18 — every query expressible
  * over the driver's column subset: no partsupp table, no commit/receipt
  * dates, no comments) over the same parquet tables, oracle = the
  * identical SQL in DuckDB.
  *
  * Why they're here: every single §2 operator is covered by its own
  * focused query, but a 100 TB warehouse lives on multi-join pipelines
  * where Catalyst's join ORDER, broadcast choices, and partial
  * aggregation placement decide the runtime. These pin the canonical
  * shapes end-to-end: dim-filter → fact join → group → top-k (Q3/Q10),
  * the 6-table snowflake with a cross-filter (Q5 — c_nationkey must
  * equal s_nationkey ACROSS the two fact arms), pure pushdown scans
  * (Q6), dimension-alias self-reference (Q7 — nation twice under two
  * roles), the 7-table conditional market-share ratio (Q8), the
  * LEFT-join histogram (Q13 — zero-count groups preserved), a
  * ratio-of-conditional-aggregates (Q14), the scalar-subquery max
  * (Q15), the decorrelated per-group average (Q17), and a
  * having-subquery semi-join (Q18).
  *
  * Determinism: all money math in exact DECIMAL via the Det helpers
  * (identical SQL fragments on both engines), all top-k orderings carry
  * a unique tiebreak column, dates compared as NTZ timestamp literals
  * (both engines UTC). l_quantity sums are integral doubles < 2^53 —
  * order-independent by exactness.
  *
  * Scale notes (the plans Catalyst picks here are the 100 TB ones):
  * nation/region broadcast everywhere; customer-orders and
  * orders-lineitem are the big shuffles and AQE sizes them; Q18's
  * having-subquery is ONE extra aggregate over lineitem feeding a
  * shuffle semi-join, never a driver-side IN-list; the top-k queries end
  * in TakeOrderedAndProject, not a global sort. */
object Tpch extends QueryPack {
  import QueryDef._

  private val rev = "CAST(l_extendedprice AS DECIMAL(12,2)) * " +
    "(CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"
  private def revC = dec2(col("l_extendedprice")) * (one - rate(col("l_discount")))

  /** TPC-H Q3 — shipping priority: unshipped high-value orders of one
    * segment. Plan: segment filter prunes customer BEFORE the join,
    * date filters push to both fact scans, final top-10 is
    * TakeOrderedAndProject. */
  val tq3: QueryDef = m(
    "tq3_shipping_priority",
    s"""SELECT l_orderkey, ${oMoney(s"SUM($rev)")} AS revenue, o_orderdate
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (spark, dir) =>
    Tables.customer(spark, dir).where(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(spark, dir)
        .where(col("o_orderdate") < Tables.tsLit("1998-03-15 00:00:00")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, dir)
        .where(col("l_shipdate") > Tables.tsLit("1998-03-15 00:00:00")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(money(sum(revC)).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
  }

  /** TPC-H Q5 — local supplier volume: the 6-table snowflake whose
    * defining predicate is CROSS-ARM (c_nationkey = s_nationkey joins
    * the customer arm to the supplier arm). region/nation broadcast;
    * the fact-fact equi-joins shuffle. */
  val tq5: QueryDef = m(
    "tq5_local_supplier_volume",
    s"""SELECT n_name, ${oMoney(s"SUM($rev)")} AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (spark, dir) =>
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
        .where(col("o_orderdate") >= Tables.tsLit("1996-01-01 00:00:00") &&
          col("o_orderdate") < Tables.tsLit("1997-01-01 00:00:00")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).where(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(money(sum(revC)).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q6 — forecast revenue change: the pure-pushdown scan (every
    * predicate reaches the parquet reader; PlanSpec pins PushedFilters
    * for the same shape on b4). Discounts are exact 2-dp doubles, so the
    * BETWEEN endpoints hit exactly on both engines. */
  val tq6: QueryDef = m(
    "tq6_revenue_forecast",
    s"""SELECT ${oMoney(s"SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2)))")} AS revenue
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= Tables.tsLit("1996-01-01 00:00:00") &&
        col("l_shipdate") < Tables.tsLit("1997-01-01 00:00:00") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(money(sum(dec2(col("l_extendedprice")) * rate(col("l_discount"))))
        .as("revenue"))
  }

  /** TPC-H Q10 — returned items: which customers returned the most value
    * in a quarter. Customer attributes ride the aggregation key (exact
    * passthrough doubles); top-20 with the unique custkey tiebreak. */
  val tq10: QueryDef = m(
    "tq10_returned_items",
    s"""SELECT c_custkey, c_name, ${oMoney(s"SUM($rev)")} AS revenue, c_acctbal, n_name
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_returnflag = 'R'
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (spark, dir) =>
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
        .where(col("o_orderdate") >= Tables.tsLit("1996-10-01 00:00:00") &&
          col("o_orderdate") < Tables.tsLit("1997-01-01 00:00:00")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, dir).where(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(money(sum(revC)).as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey")).limit(20)
  }

  /** TPC-H Q14 — promo revenue share: ratio of two conditional decimal
    * sums. Both sums are exact decimals; the single final division runs
    * on doubles cast from them — one IEEE op, identical on both engines.
    * CASE has no ELSE (sum skips nulls) on both sides alike. */
  val tq14: QueryDef = m(
    "tq14_promo_effect",
    s"""SELECT CAST(${oMoney(s"SUM(CASE WHEN p_type = 'PROMO' THEN $rev END)")} * 100.0
       |  / ${oMoney(s"SUM($rev)")} AS DOUBLE) AS promo_share
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= Tables.tsLit("1996-09-01 00:00:00") &&
        col("l_shipdate") < Tables.tsLit("1996-10-01 00:00:00"))
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .agg((money(sum(when(col("p_type") === "PROMO", revC))) * 100.0
        / money(sum(revC))).cast("double").as("promo_share"))
  }

  /** TPC-H Q18 — large-volume customers: the HAVING-subquery shape. The
    * qualifying-order set is ONE aggregate over lineitem feeding a
    * shuffle semi-join (never a collected IN-list); quantities are
    * integral doubles, so the > 300 cut is exact. */
  val tq18: QueryDef = m(
    "tq18_large_volume_customer",
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
      |  SUM(l_quantity) AS total_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |  HAVING SUM(l_quantity) > 300)
      |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
    val big = li.groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("__q"))
      .where(col("__q") > 300).select(col("l_orderkey").as("__bk"))
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"))
      .join(big, col("o_orderkey") === col("__bk"), "left_semi")
      .join(li, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(100)
  }

  /** TPC-H Q7 — cross-nation shipping volume: the DIMENSION-ALIAS shape
    * (nation joined twice under different roles, supplier-side and
    * customer-side), with the symmetric two-country predicate spanning
    * both aliases. Both nation copies broadcast; year extraction is
    * engine-identical on NTZ timestamps. */
  val tq7: QueryDef = m(
    "tq7_volume_shipping",
    s"""SELECT supp_nation, cust_nation, l_year, ${oMoney("SUM(volume)")} AS revenue
       |FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |    CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year, $rev AS volume
       |  FROM supplier
       |  JOIN lineitem ON s_suppkey = l_suppkey
       |  JOIN orders ON o_orderkey = l_orderkey
       |  JOIN customer ON c_custkey = o_custkey
       |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
       |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') sq
       |GROUP BY supp_nation, cust_nation, l_year
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (spark, dir) =>
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    Tables.supplier(spark, dir)
      .join(Tables.lineitem(spark, dir)
        .where(col("l_shipdate") >= Tables.tsLit("1996-01-01 00:00:00") &&
          col("l_shipdate") < Tables.tsLit("1998-01-01 00:00:00")),
        col("s_suppkey") === col("l_suppkey"))
      .join(Tables.orders(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir), col("c_custkey") === col("o_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .where((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
        (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("int").as("l_year"))
      .agg(money(sum(revC)).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q8 — national market share: a nation's fraction of a region's
    * part-type volume per year — the ratio-of-conditional-aggregates over
    * a 7-table join (part + both fact tables + both dimension arms +
    * nation twice + region). Decimal sums exact; one final double
    * division per year (tq14's determinism discipline). */
  val tq8: QueryDef = m(
    "tq8_market_share",
    s"""SELECT o_year,
       |  CAST(${oMoney("SUM(CASE WHEN nation = 'NATION_2' THEN volume END)")}
       |    / ${oMoney("SUM(volume)")} AS DOUBLE) AS mkt_share
       |FROM (
       |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       |    $rev AS volume, n2.n_name AS nation
       |  FROM part
       |  JOIN lineitem ON p_partkey = l_partkey
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
       |  JOIN region ON n1.n_regionkey = r_regionkey
       |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
       |  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
       |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00') sq
       |GROUP BY o_year ORDER BY o_year""".stripMargin) { (spark, dir) =>
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("n1_key"), col("n_regionkey").as("n1_rkey"))
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("nation"))
    Tables.part(spark, dir).where(col("p_type") === "STANDARD")
      .join(Tables.lineitem(spark, dir), col("p_partkey") === col("l_partkey"))
      .join(Tables.supplier(spark, dir), col("s_suppkey") === col("l_suppkey"))
      .join(Tables.orders(spark, dir)
        .where(col("o_orderdate") >= Tables.tsLit("1996-01-01 00:00:00") &&
          col("o_orderdate") < Tables.tsLit("1998-01-01 00:00:00")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("n1_key"))
      .join(broadcast(Tables.region(spark, dir).where(col("r_name") === "ASIA")),
        col("n1_rkey") === col("r_regionkey"))
      .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
      .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
      .agg((money(sum(when(col("nation") === "NATION_2", revC)))
        / money(sum(revC))).cast("double").as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q13 — customer order distribution: the LEFT-join histogram
    * shape. The outer join PRESERVES order-less customers (count = 0 must
    * appear in the histogram — an inner join would silently drop the most
    * interesting bucket), then a second aggregation over the first's
    * output. (The reference query's o_comment NOT LIKE filter drops out —
    * the synthetic orders carry no comment column.) */
  val tq13: QueryDef = m(
    "tq13_customer_distribution",
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey) sq
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) { (spark, dir) =>
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q15 — top supplier: the SCALAR-SUBQUERY-max shape (revenue
    * view → suppliers whose total equals the global max). Spark plans the
    * scalar subquery as a 1-row broadcast against the re-used aggregate;
    * ties all surface (the classic query's semantics), made deterministic
    * by the suppkey sort. */
  val tq15: QueryDef = m(
    "tq15_top_supplier",
    s"""WITH revenue AS (
       |  SELECT l_suppkey AS supplier_no, ${oMoney(s"SUM($rev)")} AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_revenue
       |FROM supplier JOIN revenue ON s_suppkey = supplier_no
       |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
       |ORDER BY s_suppkey""".stripMargin) { (spark, dir) =>
    val revenue = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= Tables.tsLit("1996-01-01 00:00:00") &&
        col("l_shipdate") < Tables.tsLit("1996-04-01 00:00:00"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(money(sum(revC)).as("total_revenue"))
    val top = revenue.agg(max(col("total_revenue")).as("__max"))
    Tables.supplier(spark, dir)
      .join(revenue, col("s_suppkey") === col("supplier_no"))
      .join(broadcast(top), col("total_revenue") === col("__max"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q17 — small-quantity-order revenue: the CORRELATED per-group
    * scalar aggregate (each row compared to ITS part's average quantity),
    * decorrelated the standard way — one aggregate over lineitem keyed by
    * part, joined back. The avg threshold is money()-rounded identically
    * on both engines so the < cut lands on the same rows. */
  val tq17: QueryDef = m(
    "tq17_small_qty_revenue",
    s"""SELECT ${oMoney("SUM(CAST(l_extendedprice AS DECIMAL(12,2)))")} / 7.0 AS avg_yearly
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |JOIN (
       |  SELECT l_partkey AS agg_pk,
       |    ${oMoney("0.2 * AVG(CAST(l_quantity AS DECIMAL(12,2)))")} AS qty_cut
       |  FROM lineitem GROUP BY l_partkey) agg ON p_partkey = agg_pk
       |WHERE p_brand = 'Brand#1' AND l_quantity < qty_cut""".stripMargin) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
    val cut = li.groupBy(col("l_partkey").as("agg_pk"))
      .agg(money(lit(BigDecimal("0.2")) * avg(dec2(col("l_quantity")))).as("qty_cut"))
    li.join(Tables.part(spark, dir).where(col("p_brand") === "Brand#1"),
        col("p_partkey") === col("l_partkey"))
      .join(cut, col("p_partkey") === col("agg_pk"))
      .where(col("l_quantity") < col("qty_cut"))
      .agg((money(sum(dec2(col("l_extendedprice")))) / 7.0).as("avg_yearly"))
  }

  /** TPC-H Q19 (adapted: p_container/l_shipmode absent — the brand/size/
    * quantity disjunction carries the shape) — discounted revenue under
    * an OR of cross-table conjunctions. The plan shape this pins: the
    * disjunction references BOTH sides, so no single branch pushes
    * whole; Catalyst's CNF conversion still extracts the per-side
    * residue (p_brand IN ... on the part scan) and the join itself stays
    * an equi-join, never a cartesian with a post-filter. */
  val tq19: QueryDef = m(
    "tq19_disjunctive_revenue",
    s"""SELECT ${oMoney(s"SUM($rev)")} AS revenue
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       |       AND l_quantity BETWEEN 1 AND 11)
       |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       |       AND l_quantity BETWEEN 10 AND 20)
       |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin) { (spark, dir) =>
    def arm(brand: String, szHi: Int, qLo: Int, qHi: Int) =
      col("p_brand") === brand && col("p_size").between(1, szHi) &&
        col("l_quantity").between(qLo, qHi)
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .where(arm("Brand#12", 5, 1, 11) || arm("Brand#23", 10, 10, 20) ||
        arm("Brand#34", 15, 20, 30))
      .agg(money(sum(revC)).as("revenue"))
  }

  /** TPC-H Q22 (adapted: c_phone absent — the country code is the last
    * two digits of c_name, same two-char-prefix algebra; and the driver's
    * generator gives EVERY customer orders, so the "no orders" arm
    * becomes "no single large order" — the anti-join shape is identical,
    * its probe side just filtered) — customers above the positive-balance
    * average without a 400k+ order. The shapes this pins: a scalar
    * aggregate as a broadcast single-row cross join (both engines divide
    * the SAME exact decimal sum by the same count — the cut lands
    * identically), and NOT EXISTS as a left-anti join, never a
    * driver-side list. */
  val tq22: QueryDef = m(
    "tq22_sales_opportunity",
    s"""WITH cust AS (
       |  SELECT substring(c_name, 17, 2) AS code, c_custkey, c_acctbal
       |  FROM customer
       |  WHERE substring(c_name, 17, 2) IN ('06','09','12','18','23','31','55')
       |), a AS (
       |  SELECT ${oMoney("SUM(CAST(c_acctbal AS DECIMAL(12,2)))")} AS s,
       |    COUNT(*) AS c
       |  FROM cust WHERE c_acctbal > 0.0
       |)
       |SELECT code, COUNT(*) AS numcust,
       |  ${oMoney("SUM(CAST(c_acctbal AS DECIMAL(12,2)))")} AS totacctbal
       |FROM cust, a
       |WHERE c_acctbal > s / c
       |  AND NOT EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = c_custkey
       |                    AND o_totalprice > 400000.0)
       |GROUP BY code ORDER BY code""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.functions.broadcast
    val cust = Tables.customer(spark, dir)
      .withColumn("code", substring(col("c_name"), 17, 2))
      .where(col("code").isin("06", "09", "12", "18", "23", "31", "55"))
    val cut = cust.where(col("c_acctbal") > 0.0)
      .agg(money(sum(dec2(col("c_acctbal")))).as("s"),
        count(lit(1)).as("c"))
    cust.crossJoin(broadcast(cut))
      .where(col("c_acctbal") > col("s") / col("c"))
      .join(Tables.orders(spark, dir)
        .where(col("o_totalprice") > 400000.0).select(col("o_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy(col("code"))
      .agg(count(lit(1)).as("numcust"),
        money(sum(dec2(col("c_acctbal")))).as("totacctbal"))
      .orderBy(col("code"))
  }

  override def defs: Seq[QueryDef] =
    Seq(tq3, tq5, tq6, tq7, tq8, tq10, tq13, tq14, tq15, tq17, tq18,
      tq19, tq22)
}
