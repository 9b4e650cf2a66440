package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Determinism helpers implementing SURVEY.md §2.D D-rules.
  *
  * Goal: bit-identical float64 between Spark and the DuckDB oracle
  * (the driver hash-compares values — BASELINE.json:2). Strategy:
  *
  *  1. The source money/rate columns are 2-dp-exact doubles, so casting
  *     them to DECIMAL recovers the exact decimal value on both engines.
  *  2. All arithmetic (multiply/add/sum) happens in DECIMAL with tight
  *     precisions so no engine ever rounds mid-expression.
  *  3. The final value is rounded half-away-from-zero in the decimal
  *     domain (both engines agree there), narrowed to DECIMAL(18,2)
  *     (integer representation < 2^53 → exact), and only then cast to
  *     DOUBLE: a single correctly-rounded decimal→double conversion,
  *     identical on both engines.
  *
  * Averages divide that exact double by an exact BIGINT count — IEEE
  * division is correctly rounded, so it also matches bit-for-bit.
  *
  * Each Spark-side helper has an `o`-prefixed twin producing the exact
  * DuckDB SQL fragment, so query and oracle can never drift.
  */
object Det {
  /** Exact decimal type for 2-dp money columns (values < 10^10). */
  val Money: DecimalType = DecimalType(12, 2)

  /** Exact decimal type for 2-dp rates in [0, 1] (discount, tax). */
  val Rate: DecimalType = DecimalType(4, 2)

  def dec2(c: Column): Column = c.cast(Money)
  def oDec2(e: String): String = s"CAST($e AS DECIMAL(12,2))"

  def rate(c: Column): Column = c.cast(Rate)
  def oRate(e: String): String = s"CAST($e AS DECIMAL(4,2))"

  /** Decimal literal 1.00 — a narrow type keeps product precisions small
    * enough that neither engine hits its 38-digit cap (which would force
    * engine-specific precision-loss rounding). */
  val one: Column = lit(1).cast(DecimalType(3, 2))
  val oOne: String = "CAST(1 AS DECIMAL(3,2))"

  /** Final money output: decimal round(2) → DECIMAL(18,2) → DOUBLE. */
  def money(c: Column): Column =
    round(c, 2).cast(DecimalType(18, 2)).cast(DoubleType)
  def oMoney(e: String): String =
    s"CAST(CAST(ROUND($e, 2) AS DECIMAL(18,2)) AS DOUBLE)"

  /** Deterministic mean: exact rounded decimal sum (as double) / count. */
  def avg2(sum: Column, cnt: Column): Column = money(sum) / cnt
  def oAvg2(sumE: String, cntE: String): String = s"${oMoney(sumE)} / $cntE"

  /** Round a double score to 6 dp for similarity outputs (D-rule 7).
    * Both engines round the same double; ties at the 7th decimal digit of
    * a binary double are astronomically unlikely in generated data. */
  def score6(c: Column): Column = round(c, 6)
  def oScore6(e: String): String = s"ROUND($e, 6)"
}
