package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** SURVEY.md §2.K6 — native Catalyst expression computing a full MinHash
  * signature (ARRAY<LONG> of `numHashes` lane minima) over a token array
  * in ONE fused pass, with whole-stage codegen.
  *
  * Bit-identical by construction to the HOF composition it replaces:
  *
  * {{{
  *   base  = transform(ts, t -> xxhash64(t))            -- one string hash
  *   lane h = array_min(transform(base, b -> xxhash64(h, b)))
  * }}}
  *
  * because it calls the same `XXH64` kernels Spark's `xxhash64` lowers
  * to: `hashUTF8String(t, 42)` for the base, then
  * `hashLong(base, hashInt(h, 42))` per lane (xxhash64 folds argument
  * `h` into the running seed, so each lane is an independent member of
  * the family). A spec asserts the equivalence on both eval paths.
  *
  * Why an Expression and not the HOF form: every higher-order function
  * is interpreted (per-element lambda dispatch, one freshly allocated
  * array per lane), so the HOF signature build is `numHashes + 1`
  * interpreted traversals per row and dominates the LSH candidate stage.
  * This loop runs inside WholeStageCodegen: per token it does one string
  * hash and `numHashes` 8-byte hashes against a running minimum — no
  * intermediate arrays at all.
  *
  * Null semantics (matching the HOF form exactly): null array → null;
  * empty array → every lane null (`array_min` over empty is null); a
  * null TOKEN hashes to the seed itself (xxhash64 skips null children),
  * so it still participates in every lane minimum.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, s"graft_minhash_sig: numHashes must be positive, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig expects array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "graft_minhash_sig"

  /** xxhash64(h, b) = hashLong(b, hashInt(h, 42)) — precompute the
    * per-lane seeds once. */
  private lazy val laneSeeds: Array[Long] =
    Array.tabulate(numHashes)(h => XXH64.hashInt(h, 42L))

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes)) // all-null lanes
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val base =
        if (arr.isNullAt(i)) 42L // null child leaves the seed untouched
        else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var h = 0
      while (h < numHashes) {
        val v = XXH64.hashLong(base, laneSeeds(h))
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(m => Long.box(m): Any))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val seeds = ctx.addReferenceObj("laneSeeds", laneSeeds, "long[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val base = ctx.freshName("base")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      val vals = ctx.freshName("vals")
      s"""
         |final int $n = $a.numElements();
         |Object[] $vals = new Object[$numHashes];
         |if ($n > 0) {
         |  long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $base = $a.isNullAt($i)
         |      ? 42L : $xxh.hashUTF8String($a.getUTF8String($i), 42L);
         |    for (int $h = 0; $h < $numHashes; $h++) {
         |      final long $v = $xxh.hashLong($base, $seeds[$h]);
         |      if ($v < $mins[$h]) $mins[$h] = $v;
         |    }
         |  }
         |  for (int $h = 0; $h < $numHashes; $h++) $vals[$h] = $mins[$h];
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($vals);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
