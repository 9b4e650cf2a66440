package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, driver-verifiable query: a Spark builder plus (for M-tier
  * rows) the equivalent DuckDB oracle SQL. SURVEY.md §2 is the contract;
  * names key back to its rows (e.g. `e1_` ↔ §2.E1). */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** M-tier: oracle-checked. */
  def m(name: String, oracle: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, Some(oracle))
  /** X-tier: runs through Verify (rows-only check), no SQL oracle. */
  def x(name: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, None)
}

/** A category of §2 rows (one object per letter). */
trait QueryPack {
  def defs: Seq[QueryDef]
}
