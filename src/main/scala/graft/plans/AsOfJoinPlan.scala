package graft.plans

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** §2.D7 as a whole-operator Catalyst extension (SURVEY §2.M tier (c)):
  * a custom `LogicalPlan` + `SparkStrategy` + `SparkPlan` registered via
  * `SparkSessionExtensions` (or `spark.experimental.extraStrategies`).
  *
  * Semantics (left as-of join): for every left row, attach the LAST right
  * row with equal keys and `rightTs <= leftTs` (inclusive — a right row at
  * the exact left timestamp counts, matching DuckDB's `ASOF LEFT JOIN ...
  * ON l.k = r.k AND r.ts <= l.ts`); left rows with no such right row keep
  * nulls on the right side.
  *
  * Why a custom operator instead of the d7 window construction: the
  * compositional form (union-tag + running last_value) carries BOTH full
  * rows through one sort, while this node shuffles each side only on its
  * own key and streams a single forward merge pass per partition — no
  * window state, no union, and the right side can be pre-filtered
  * independently. Same single-shuffle-per-side cost class as a sort-merge
  * join, which is the right 100-TB shape for fact-to-fact time alignment.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression)
  extends BinaryNode {

  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs at least one equi-key per side")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: AsOfJoinPlan → AsOfJoinExec. Unknown plans fall
  * through so the built-in strategies keep planning everything else. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
    case _ => Nil
  }
}

/** User-facing API for the native as-of join. */
object AsOf {

  /** Idempotently add the planner strategy + optimizer rules to a live
    * session (the blessed conf route is
    * `spark.sql.extensions=graft.ext.GraftSparkExtensions`, which injects
    * the same objects — and there the rules run inside the main operator-
    * optimization fixed point, so pushed filters reach the scans). */
  def ensureStrategy(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
    if (!exp.extraOptimizations.contains(AsOfJoinRules))
      exp.extraOptimizations = exp.extraOptimizations :+ AsOfJoinRules
  }

  /** Left as-of join `left ⟕asof right`. Column names must be disjoint
    * across the two sides (rename the right side first); right rows with a
    * null timestamp are dropped (they can never be "the latest at-or-
    * before"), left rows with a null timestamp match nothing.
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTs: String,
      rightTs: String): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"as-of join output names must be disjoint; rename: ${overlap.mkString(",")}")
    // Re-alias the right side so its output gets fresh ExprIds — both
    // sides often derive from the same scan (self-as-of), and duplicate
    // ids across left/right would make the combined output ambiguous.
    val rFresh = right
      .where(col(rightTs).isNotNull)
      .select(right.columns.map(c => col(c).as(c)).toIndexedSeq: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rFresh.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"as-of join: no column '$n' in [${p.output.map(_.name).mkString(",")}]"))
    GraftSqlBridge.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      leftKeys.map(attr(lPlan, _)), rightKeys.map(attr(rPlan, _)),
      attr(lPlan, leftTs), attr(rPlan, rightTs)))
  }
}
