package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of BPE-ish tokens: the number of matches of the regex
  * `[aeiou]+|[^aeiou ]+` (SURVEY.md §2.J token counting, the j10 hot
  * path), fused into one codegen loop.
  *
  * The regex's matches are exactly the maximal runs of same-class
  * characters, where the classes are vowel (aeiou), other (anything but
  * vowels and space — uppercase and non-ASCII included), and space
  * (matched by neither branch, so it only breaks runs). Counting run
  * starts in a single code-point scan is therefore match-count-identical
  * to the regex on both engines (Java regex and RE2 both class-match per
  * code point) — with no per-row regex engine and no match
  * materialization. ExtensionsSpec/HardeningSpec assert equality against
  * the regexp form. */
case class BpeishTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bpeish_count expects string, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_bpeish_count"

  // class codes: 0 = vowel, 1 = other, 2 = space (breaks runs)
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var n = 0L
    var prev = 2
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val cls =
        if (cp == ' ') 2
        else if (cp == 'a' || cp == 'e' || cp == 'i' || cp == 'o' || cp == 'u') 0
        else 1
      if (cls != 2 && cls != prev) n += 1
      prev = cls
      i += Character.charCount(cp)
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val cls = ctx.freshName("cls")
      val prev = ctx.freshName("prev")
      s"""
         |String $s = $a.toString();
         |long $n = 0L;
         |int $prev = 2;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  int $cls = ($cp == ' ') ? 2
         |    : ($cp == 'a' || $cp == 'e' || $cp == 'i' || $cp == 'o' || $cp == 'u') ? 0 : 1;
         |  if ($cls != 2 && $cls != $prev) $n++;
         |  $prev = $cls;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BpeishTokenCount =
    copy(child = newChild)
}
