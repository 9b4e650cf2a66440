package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables

/** SURVEY.md §2.H — set operations. All shuffle on the full row; distinct
  * variants are hash aggregates under the hood (partial dedup map-side).
  */
object SetOps extends QueryPack {
  import QueryDef._

  /** §2.H1 — union all by name. */
  val h1: QueryDef = m(
    "h1_union_all",
    """SELECT c_custkey AS k, 'customer' AS src FROM customer
      |UNION ALL
      |SELECT s_suppkey AS k, 'supplier' AS src FROM supplier
      |ORDER BY k, src""".stripMargin) { (spark, dir) =>
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey").as("k"), lit("customer").as("src"))
    val s = Tables.supplier(spark, dir)
      .select(col("s_suppkey").as("k"), lit("supplier").as("src"))
    c.unionByName(s).orderBy(col("k"), col("src"))
  }

  /** §2.H2 — union distinct. */
  val h2: QueryDef = m(
    "h2_union_distinct",
    """SELECT c_nationkey AS nk FROM customer
      |UNION
      |SELECT s_nationkey FROM supplier
      |ORDER BY nk""".stripMargin) { (spark, dir) =>
    val c = Tables.customer(spark, dir).select(col("c_nationkey").as("nk"))
    val s = Tables.supplier(spark, dir).select(col("s_nationkey").as("nk"))
    c.union(s).distinct().orderBy(col("nk"))
  }

  /** §2.H3 — intersect (distinct). */
  val h3: QueryDef = m(
    "h3_intersect",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY o_custkey""".stripMargin) { (spark, dir) =>
    val o = Tables.orders(spark, dir)
    o.where(col("o_orderstatus") === "O").select(col("o_custkey"))
      .intersect(o.where(col("o_orderstatus") === "F").select(col("o_custkey")))
      .orderBy(col("o_custkey"))
  }

  /** §2.H4 — except (distinct). */
  val h4: QueryDef = m(
    "h4_except",
    """SELECT c_custkey FROM customer
      |EXCEPT
      |SELECT o_custkey FROM orders
      |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
    Tables.customer(spark, dir).select(col("c_custkey"))
      .except(Tables.orders(spark, dir).select(col("o_custkey")))
      .orderBy(col("c_custkey"))
  }

  /** §2.H5 — intersect all (multiset semantics). */
  val h5a: QueryDef = m(
    "h5_intersect_all",
    """SELECT l_suppkey FROM lineitem WHERE l_quantity < 10
      |INTERSECT ALL
      |SELECT l_suppkey FROM lineitem WHERE l_quantity > 40
      |ORDER BY l_suppkey""".stripMargin) { (spark, dir) =>
    val l = Tables.lineitem(spark, dir)
    l.where(col("l_quantity") < 10).select(col("l_suppkey"))
      .intersectAll(l.where(col("l_quantity") > 40).select(col("l_suppkey")))
      .orderBy(col("l_suppkey"))
  }

  /** §2.H5 — except all (multiset semantics). */
  val h5b: QueryDef = m(
    "h5_except_all",
    """SELECT l_suppkey FROM lineitem WHERE l_quantity < 10
      |EXCEPT ALL
      |SELECT l_suppkey FROM lineitem WHERE l_quantity > 40
      |ORDER BY l_suppkey""".stripMargin) { (spark, dir) =>
    val l = Tables.lineitem(spark, dir)
    l.where(col("l_quantity") < 10).select(col("l_suppkey"))
      .exceptAll(l.where(col("l_quantity") > 40).select(col("l_suppkey")))
      .orderBy(col("l_suppkey"))
  }

  override def defs: Seq[QueryDef] = Seq(h1, h2, h3, h4, h5a, h5b)
}
