package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.DataType

/** Single-purpose bridge into the `private[sql]` classic Dataset
  * constructor: turn a hand-built `LogicalPlan` (graft.plans.AsOfJoinPlan)
  * back into a user-facing DataFrame. This is the standard extension-
  * library pattern for custom logical operators (the public API offers no
  * other plan→DataFrame route); nothing else from the private surface is
  * touched.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Expression ↔ Column bridge (`classic.ExpressionUtils` is
    * `private[sql]`) — used to attach parameterized custom expressions
    * (graft.ext.BpeTokens carries its learned merge table) that the
    * FunctionRegistry's literal-only builder route cannot express. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Nullability-insensitive type equality (`DataType.sameType` is
    * `private[sql]`) — used by AsOfJoinPlan to reject key/timestamp pairs
    * whose bytes would hash/order differently across the two sides. */
  def sameType(a: DataType, b: DataType): Boolean = a.sameType(b)

  /** Recursive nullable clone (`StructType.asNullable` is
    * `private[spark]`) — a file-relation read schema must be nullable
    * like `DataFrameReader.schema` forces, or the vectorized parquet
    * reader refuses pre-evolution files missing a NOT NULL column
    * instead of filling typed nulls. */
  def asNullable(s: types.StructType): types.StructType = s.asNullable

  /** Re-plan `df` under a session CLONE with the given conf overrides
    * (`cloneSession` is `private[sql]`). The clone shares catalog, temp
    * views, and registered functions, but its SQLConf is an isolated
    * copy — so a library write that needs a specific conf (graft_table
    * staging pins parquet timestamps to INT64-micros) neither mutates
    * the caller's session nor races concurrent writers the way a
    * set/restore on the shared conf would. */
  def withConf(df: DataFrame, kv: (String, String)*): DataFrame = {
    val clone = df.sparkSession.asInstanceOf[classic.SparkSession].cloneSession()
    kv.foreach { case (k, v) => clone.conf.set(k, v) }
    classic.Dataset.ofRows(clone, df.queryExecution.logical)
  }
}
