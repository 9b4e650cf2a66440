package graft.ext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SURVEY.md §2.M4 — a custom UDTF (`Generator`): emits one row per n-gram
  * of a token array, with its 0-based position.
  *
  * Scale path for §2.J4 when n-grams feed a downstream aggregation
  * (shingle counting, MinHash): generating rows directly avoids
  * materializing the per-document n-gram array that the HOF construction
  * (transform ∘ sequence ∘ slice) builds before its explode.
  * CodegenFallback is standard for generators (explode itself aside,
  * Generate's children rarely codegen); the row loop is allocation-light.
  */
case class NGramsGen(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ngrams expects (array<string>, n >= 1), got ${other.sql}, n=$n")
  }

  private val sep = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) Iterator.empty
    else {
      val toks = new Array[UTF8String](arr.numElements())
      var i = 0
      while (i < toks.length) { toks(i) = arr.getUTF8String(i); i += 1 }
      (0 to toks.length - n).iterator.map { p =>
        InternalRow(p, UTF8String.concatWs(sep, toks.slice(p, p + n).toIndexedSeq: _*))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGramsGen =
    copy(child = newChild)
}
