package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.core.Det._

/** SURVEY.md §2.F window functions + §2.G sorts/limits.
  *
  * Scale: every window here is partitioned (by supplier / user) — the
  * shuffle is by partition key and each partition sorts locally. No
  * global-window (single-partition) patterns on fact tables. Ranking
  * functions that admit ties are ordered by the tie-full key only where
  * tie semantics are the point (rank/dense_rank); row_number/ntile always
  * get a total order (D-rule 5).
  */
object Windows extends QueryPack {
  import QueryDef._

  /** Total-order key for lineitem windows. (l_orderkey, l_linenumber) is
    * NOT unique in the synthetic data (measured: 11785 duplicate pairs at
    * sf0.01); adding l_shipdate + l_extendedprice makes it unique at every
    * SF (0 duplicate quads at sf0.001/0.01/0.1 — verified via DuckDB).
    * Every window over lineitem orders by this quad so that rank/offset/
    * frame results are engine-independent (D-rule 1/5). */
  private val fullKey = Seq(col("l_shipdate"), col("l_orderkey"),
    col("l_linenumber"), col("l_extendedprice"))
  private val oFullKey = "l_shipdate, l_orderkey, l_linenumber, l_extendedprice"

  /** §2.F1 — ranking family. */
  val f1: QueryDef = m(
    "f1_ranking",
    s"""SELECT l_suppkey, l_orderkey, l_linenumber,
       |  ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY $oFullKey) AS rn,
       |  RANK() OVER (PARTITION BY l_suppkey ORDER BY l_shipdate) AS rnk,
       |  DENSE_RANK() OVER (PARTITION BY l_suppkey ORDER BY l_shipdate) AS drnk,
       |  PERCENT_RANK() OVER (PARTITION BY l_suppkey ORDER BY l_shipdate) AS prnk,
       |  CUME_DIST() OVER (PARTITION BY l_suppkey ORDER BY l_shipdate) AS cd,
       |  NTILE(4) OVER (PARTITION BY l_suppkey ORDER BY $oFullKey) AS tile
       |FROM lineitem
       |ORDER BY l_suppkey, rn""".stripMargin) { (spark, dir) =>
    val wTotal = Window.partitionBy(col("l_suppkey")).orderBy(fullKey: _*)
    val wTies = Window.partitionBy(col("l_suppkey")).orderBy(col("l_shipdate"))
    Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        row_number().over(wTotal).cast("long").as("rn"),
        rank().over(wTies).cast("long").as("rnk"),
        dense_rank().over(wTies).cast("long").as("drnk"),
        percent_rank().over(wTies).as("prnk"),
        cume_dist().over(wTies).as("cd"),
        ntile(4).over(wTotal).cast("long").as("tile"))
      .orderBy(col("l_suppkey"), col("rn"))
  }

  /** §2.F2 — offset functions (defaults included). Offset values are raw
    * double pass-throughs — no arithmetic, bit-identical. */
  val f2: QueryDef = m(
    "f2_offset",
    s"""SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate, l_extendedprice,
       |  lag(l_extendedprice, 1) OVER w AS prev_price,
       |  lead(l_extendedprice, 2, -1.0) OVER w AS next2_price
       |FROM lineitem
       |WINDOW w AS (PARTITION BY l_suppkey ORDER BY $oFullKey)
       |ORDER BY l_suppkey, $oFullKey""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("l_suppkey")).orderBy(fullKey: _*)
    Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"), col("l_extendedprice"),
        lag(col("l_extendedprice"), 1).over(w).as("prev_price"),
        lead(col("l_extendedprice"), 2, -1.0).over(w).as("next2_price"))
      .orderBy(col("l_suppkey") +: fullKey: _*)
  }

  /** §2.F3 — running (cumulative) frame with exact decimal sums. */
  val f3: QueryDef = m(
    "f3_running_sum",
    s"""SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate, l_extendedprice,
       |  ${oMoney(s"SUM(${oDec2("l_extendedprice")}) OVER (PARTITION BY l_suppkey ORDER BY $oFullKey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS running_price
       |FROM lineitem
       |ORDER BY l_suppkey, $oFullKey""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("l_suppkey")).orderBy(fullKey: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"), col("l_extendedprice"),
        money(sum(dec2(col("l_extendedprice"))).over(w)).as("running_price"))
      .orderBy(col("l_suppkey") +: fullKey: _*)
  }

  /** §2.F4 — sliding frame: 3-row moving average (decimal, D-rule 2). */
  val f4: QueryDef = m(
    "f4_moving_avg",
    s"""SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate, l_extendedprice,
       |  ${oMoney(s"SUM(${oDec2("l_quantity")}) OVER w3")} / COUNT(l_quantity) OVER w3 AS mov_avg_qty
       |FROM lineitem
       |WINDOW w3 AS (PARTITION BY l_suppkey ORDER BY $oFullKey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
       |ORDER BY l_suppkey, $oFullKey""".stripMargin) { (spark, dir) =>
    val w3 = Window.partitionBy(col("l_suppkey")).orderBy(fullKey: _*)
      .rowsBetween(-2, Window.currentRow)
    Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"), col("l_extendedprice"),
        (money(sum(dec2(col("l_quantity"))).over(w3)) / count(col("l_quantity")).over(w3)).as("mov_avg_qty"))
      .orderBy(col("l_suppkey") +: fullKey: _*)
  }

  /** §2.F5 — range frame: trailing 7-day event count per user, ordered by
    * the exact nanosecond epoch (identical integer domain on both engines). */
  val f5: QueryDef = m(
    "f5_range_frame",
    """SELECT event_id, user_id,
      |  COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)
      |    RANGE BETWEEN 604800000000000000 PRECEDING AND CURRENT ROW) AS n_7d
      |FROM events
      |ORDER BY event_id""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rangeBetween(-604800000000000000L, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_7d"))
      .orderBy(col("event_id"))
  }

  /** §2.F6 — first_value / last_value with explicit frames + IGNORE NULLS. */
  val f6: QueryDef = m(
    "f6_first_last",
    s"""SELECT l_suppkey, l_orderkey, l_linenumber,
       |  first_value(l_extendedprice) OVER wf AS first_price,
       |  last_value(l_extendedprice) OVER wf AS last_price,
       |  first_value(nullif(l_discount, 0) IGNORE NULLS) OVER wf AS first_nonzero_disc
       |FROM lineitem
       |WINDOW wf AS (PARTITION BY l_suppkey ORDER BY $oFullKey
       |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin) { (spark, dir) =>
    val wf = Window.partitionBy(col("l_suppkey")).orderBy(fullKey: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        first(col("l_extendedprice")).over(wf).as("first_price"),
        last(col("l_extendedprice")).over(wf).as("last_price"),
        first(nullif(col("l_discount"), lit(0)), ignoreNulls = true).over(wf).as("first_nonzero_disc"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** §2.F7 — top-k per group with full tiebreak (D-rule 5). */
  val f7: QueryDef = m(
    "f7_topk_per_group",
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
      |    ROW_NUMBER() OVER (PARTITION BY l_suppkey
      |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_shipdate) AS rn
      |  FROM lineitem) t
      |WHERE rn <= 3
      |ORDER BY l_suppkey, rn""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
    Tables.lineitem(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 3)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("rn"))
      .orderBy(col("l_suppkey"), col("rn"))
  }

  /** §2.G1 — global multi-key sort, asc/desc with explicit null order. */
  val g1: QueryDef = m(
    "g1_multi_sort",
    """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_totalprice DESC NULLS LAST, o_orderkey ASC""".stripMargin) {
    (spark, dir) =>
      Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_totalprice").desc_nulls_last, col("o_orderkey").asc)
  }

  /** §2.G2 — limit after a total order (TakeOrderedAndProject: per-
    * partition top-k then driver merge — no global sort at any scale). */
  val g2: QueryDef = m(
    "g2_ordered_limit",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC
      |LIMIT 100""".stripMargin) { (spark, dir) =>
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc)
      .limit(100)
  }

  /** G-tier extension — Z-ORDER (Morton) clustering key: the
    * multi-dimensional data-skipping layout. `clusterBy` on (a, b) gives
    * files a tight range on `a` only; ordering by the interleaved code of
    * two quantized columns gives every file a small SQUARE of the (x, y)
    * grid, so min/max row-group stats prune scans filtered on EITHER
    * column. The code is pure built-in bit algebra (ext/ZOrder.scala —
    * one WholeStageCodegen pass, no UDF), and the oracle replays the
    * identical arithmetic in DuckDB via the shared SQL emitter, so the
    * codes are hash-checked bit-for-bit. Tie-break note: z is a bijection
    * of (xq, yq) — deinterleave recovers both — so (z, o_orderkey) is a
    * total order wherever (xq, yq, o_orderkey) is. */
  val g4: QueryDef = {
    val zSql = graft.ext.ZOrder.interleaveSql("xq", "yq", 8)
    m(
      "g4_zorder_cluster",
      s"""WITH q AS (SELECT o_orderkey, o_custkey % 256 AS xq,
         |  CAST(floor(o_totalprice) AS BIGINT) % 256 AS yq FROM orders)
         |SELECT o_orderkey, xq, yq, ($zSql) AS z
         |FROM q ORDER BY z, o_orderkey""".stripMargin) { (spark, dir) =>
      val q = Tables.orders(spark, dir).select(
        col("o_orderkey"),
        (col("o_custkey") % 256).as("xq"),
        (floor(col("o_totalprice")).cast("bigint") % 256).as("yq"))
      q.select(col("o_orderkey"), col("xq"), col("yq"),
          graft.ext.ZOrder.interleave(col("xq"), col("yq"), 8).as("z"))
        // the layout move this key exists for is repartitionByRange(z) +
        // sortWithinPartitions(z) at write time (= `clusterBy` on a
        // derived z column); the query materializes the code itself so
        // the oracle can pin the arithmetic
        .orderBy(col("z"), col("o_orderkey"))
    }
  }

  /** G-tier extension — DETERMINISTIC CORPUS SHUFFLE: the pre-training
    * data-order step (training runs need the corpus in a reproducible
    * pseudorandom order, decoupled from ingestion order). The shuffle key
    * is `md5(seed ':' doc_id)` — a seeded hash both engines compute
    * identically (lowercase hex of the UTF-8 bytes), so unlike
    * xxhash64-based keys (i9x) this permutation IS cross-engine
    * oracle-able. Sorting by it is Spark's range-partitioned global sort:
    * the key is uniform by construction, so every partition gets an equal
    * key range — a balanced, skew-proof, restart-stable shuffle at any
    * scale (vs `repartition(rand())`, which is neither deterministic nor
    * resumable). A new seed = a new epoch order, no data movement logic
    * changes. Also exposed as the config-surface `op: shuffle`. */
  val g5: QueryDef = m(
    "g5_corpus_shuffle",
    """SELECT doc_id, md5(concat_ws(':', '42', CAST(doc_id AS VARCHAR))) AS skey
      |FROM documents ORDER BY skey""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(concat_ws(":", lit("42"), col("doc_id").cast("string"))).as("skey"))
      .orderBy(col("skey"))
  }

  override def defs: Seq[QueryDef] = Seq(f1, f2, f3, f4, f5, f6, f7, g1, g2, g4, g5)
}
