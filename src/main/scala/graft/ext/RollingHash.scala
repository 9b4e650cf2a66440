package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint (SURVEY.md §2.J
  * fingerprinting, the j10 hot path): h ← (h·31 + codepoint) mod 1e9+7
  * over the string's characters, exact int64 arithmetic.
  *
  * This is the codegen replacement for the HOF form
  * `aggregate(transform(sequence(1, length(text)), i ->
  * ascii(substring(text, i, 1))), 0L, (h, c) -> (h*31 + c) % 1000000007)`,
  * which materializes a per-character array and dispatches an interpreted
  * lambda per element — measured ~4× slower at sf0.1. One fused loop per
  * row inside WholeStageCodegen, no intermediate array. Iteration is by
  * Unicode code point, matching both `ascii(substring(s, i, 1))` (Spark)
  * and `ascii(c)` over single-character splits (DuckDB) on any input.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_hash expects string, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |String $s = $a.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * 31L + $cp) % 1000000007L;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}
