package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash signature over a token array in ONE fused per-row pass
  * (§2.K8's signature stage).
  *
  * Bit-identical by construction to the explode + 64-conditional-sum
  * aggregate it replaces (`TextOps2.simhashDocs`'s original build):
  * per token, `h = xxhash64(t)` (the same `XXH64.hashUTF8String(t, 42)`
  * kernel Spark's function lowers to; a null token leaves the seed 42,
  * matching xxhash64's null-skipping); counter `b` moves ±1 on bit `b`
  * of `h`; bit `b` of the signature lands at position `63 - b` when its
  * counter is positive — the exact `shiftleft(CASE WHEN bSum > 0 ...)`
  * assembly. SimilarityOpsSpec asserts the equivalence on the real
  * corpus, both eval paths.
  *
  * Why an Expression: the aggregate form shuffles every (doc, token)
  * pair to group the per-bit sums back per doc — at 100 TB that is a
  * full-corpus token-level exchange for a value that is a pure function
  * of one row. This runs map-only inside WholeStageCodegen: the
  * signature computes where the row sits, nothing shuffles, and the
  * one-time ~4 s whole-stage compile of the 64-sum aggregate disappears
  * entirely.
  *
  * Null semantics: null ARRAY → null signature (the row keeps flowing;
  * callers filter). An EMPTY array yields all-zero counters → sig 0
  * (callers that need explode-equivalence — where token-less docs
  * vanish — filter `size(toks) > 0`, as k8 does).
  */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counters = new Array[Long](64)
    var i = 0
    while (i < n) {
      val h =
        if (arr.isNullAt(i)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        counters(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) sig |= 1L << (63 - b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val counters = ctx.freshName("counters")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      s"""
         |final int $n = $a.numElements();
         |final long[] $counters = new long[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = $a.isNullAt($i)
         |    ? 42L : $xxh.hashUTF8String($a.getUTF8String($i), 42L);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $counters[$b] += ((($h >>> $b) & 1L) == 1L) ? 1L : -1L;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counters[$b] > 0) $sig |= 1L << (63 - $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}
