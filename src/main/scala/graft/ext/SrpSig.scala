package graft.ext

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Signed-random-projection LSH signature (§2.K9's bucketing key) as one
  * fused codegen pass: `numBits` hyperplane dot products over the input
  * vector, each contributing one sign bit, MSB = hyperplane 0.
  *
  * Bit-identical by construction to the HOF derivation it replaces:
  *
  * {{{
  *   aggregate(sequence(0, numBits-1), 0L, (acc, j) ->
  *     acc * 2 + CASE WHEN aggregate(zip_with(e, sequence(0, size(e)-1),
  *       (x, i) -> x * (CAST((xxhash64(concat('hp', j, ':', i)) & 1) * 2 - 1 AS DOUBLE))),
  *       0D, (s, x) -> s + x) > 0 THEN 1 ELSE 0 END)
  * }}}
  *
  * because the hyperplane component (j, i) is the same hash-derived ±1 —
  * `XXH64.hashUTF8String("hp<j>:<i>", 42)` is exactly what SQL
  * `xxhash64(concat('hp', j, ':', i))` lowers to — and the dot product
  * accumulates left-to-right in the same order (float addition is not
  * associative; order is part of the contract). SimilarityOpsSpec asserts
  * the equivalence on the real embeddings table, both eval paths.
  *
  * Why an Expression: the HOF form recomputes the hash for every
  * (row, bit, component) triple in interpreted lambda land — 8×dim
  * hash+concat evaluations per row made k9 the slowest non-clustering
  * query in round 14 (9.28 s for a 2k-row table). The hyperplanes are a
  * deterministic CONSTANT of (numBits, dim): compute them once per
  * observed dim, keep the per-row work at numBits fused multiply-add
  * loops inside WholeStageCodegen. At 100 TB this is the difference
  * between a map-only signature pass and a per-row hashing storm.
  *
  * Null semantics (matching the HOF): a null ELEMENT poisons the sum
  * (null product → sticky null → `CASE WHEN null > 0` takes the ELSE), so
  * every bit is 0 → sig 0. Null INPUT returns null (the saner library
  * semantics; the HOF yielded 0 there, a corner no caller relies on —
  * k9 casts a non-nullable parquet column).
  */
case class SrpSig(child: Expression, numBits: Int) extends UnaryExpression {

  require(numBits > 0 && numBits <= 63,
    s"graft_srp_sig: numBits must be in [1, 63], got $numBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_srp_sig expects array<double>, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_srp_sig"

  /** Per-dim hyperplane matrix (flattened row-major, numBits × dim),
    * computed on first use and cached — embedding columns have one dim in
    * practice, so this holds a single entry. Keyed per dim rather than
    * fixed at construction because the expression can't see the data's
    * dim at plan time. */
  @transient private lazy val cache = new ConcurrentHashMap[Integer, Array[Double]]()

  def hyperplanes(dim: Int): Array[Double] =
    cache.computeIfAbsent(dim, { d: Integer =>
      val m = new Array[Double](numBits * d)
      var j = 0
      while (j < numBits) {
        var i = 0
        while (i < d) {
          val h = XXH64.hashUTF8String(UTF8String.fromString(s"hp$j:$i"), 42L)
          m(j * d + i) = ((h & 1L) * 2 - 1).toDouble
          i += 1
        }
        j += 1
      }
      m
    })

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    var anyNull = false
    var i = 0
    while (i < dim && !anyNull) {
      if (arr.isNullAt(i)) anyNull = true
      i += 1
    }
    if (anyNull || dim == 0) return 0L
    val hp = hyperplanes(dim)
    var sig = 0L
    var j = 0
    while (j < numBits) {
      var s = 0.0
      val off = j * dim
      var k = 0
      while (k < dim) { s += arr.getDouble(k) * hp(off + k); k += 1 }
      sig = sig * 2 + (if (s > 0) 1L else 0L)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("srp", this, classOf[SrpSig].getName)
      val dim = ctx.freshName("dim")
      val anyNull = ctx.freshName("anyNull")
      val hp = ctx.freshName("hp")
      val sig = ctx.freshName("sig")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      s"""
         |final int $dim = $a.numElements();
         |boolean $anyNull = false;
         |for (int $i = 0; $i < $dim; $i++) {
         |  if ($a.isNullAt($i)) { $anyNull = true; break; }
         |}
         |long $sig = 0L;
         |if (!$anyNull && $dim > 0) {
         |  final double[] $hp = $ref.hyperplanes($dim);
         |  for (int $j = 0; $j < $numBits; $j++) {
         |    double $s = 0D;
         |    final int $off = $j * $dim;
         |    for (int $k = 0; $k < $dim; $k++) {
         |      $s += $a.getDouble($k) * $hp[$off + $k];
         |    }
         |    $sig = $sig * 2L + (($s > 0D) ? 1L : 0L);
         |  }
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SrpSig =
    copy(child = newChild)
}
