package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated test tables (TESTDATA.md, FIXTURES.md).
  *
  * Scale posture: every loader is a bare parquet scan — Catalyst pushes
  * predicates and column pruning into the scan, so the downstream operator
  * decides the real cost. Nothing here collects to the driver; at cluster
  * scale these scans split by parquet row-group across executors.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** events.parquet carries parquet TIMESTAMP(NANOS) `ts`, which Spark 4.x
    * rejects by default (FIXTURES.md "Spark gotcha"). Recipe: read nanos as
    * BIGINT and derive `event_ts` — µs-truncated, naive (NTZ) — which is
    * value-identical to DuckDB's `CAST(ts AS TIMESTAMP)` on the same file.
    *
    * The conf is set at session BUILD time by every graft entry point
    * (Verify/Bench/Show/PlanProbe/TestSpark) so plan behavior never depends
    * on whether events() ran first. The guarded set below is only a
    * fallback for foreign sessions — a no-op (no conf mutation) under any
    * graft-built session. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").forall(_ != "true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("event_ts",
        timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
  }

  /** Naive-timestamp literal for filters against TIMESTAMP_NTZ columns. */
  def tsLit(s: String): org.apache.spark.sql.Column =
    lit(s).cast(TimestampNTZType)
}
