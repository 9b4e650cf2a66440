package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deletion-vector row-liveness test INSIDE the scan: TRUE iff
  * `(file_name, row_index)` is NOT marked deleted by the table's
  * vectors — one hash probe + binary search per row, inside
  * WholeStageCodegen, no join.
  *
  * Why it exists: a merge-on-read table used to pay a per-read
  * ANTI-JOIN of every scan against its dv sidecars — a shuffle-ish plan
  * node whose cost scales with the scan, not the vectors, and nothing
  * bounded the join's build side. The scale-standard design (Delta /
  * Iceberg roaring bitmaps) applies each file's bitmap inside the scan;
  * this expression is that filter: `vectors` maps each data file's NAME
  * to its SORTED deleted-row indexes, resolved from the commit log and
  * bounded by `spark.graft.dv.inlineMaxRows` (bigger vectors fall back
  * to the anti-join). The file-name key is a per-file constant column
  * (`_metadata.file_name`), so the probe branch-predicts to one array
  * per scan partition.
  *
  * CONTRACT: each value array ascending-sorted and duplicate-free (the
  * dv staging write sorts per file). Inputs are the parquet metadata
  * columns — non-null by construction; a null input returns null like
  * any binary expression (the filter then drops the row, conservative).
  */
case class DvLiveRow(left: Expression, right: Expression,
    vectors: java.util.HashMap[UTF8String, Array[Long]])
    extends BinaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dv_live expects (string file_name, bigint row_index), " +
          s"got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override def prettyName: String = "graft_dv_live"

  override def nullSafeEval(f: Any, i: Any): Any = {
    val arr = vectors.get(f.asInstanceOf[UTF8String])
    arr == null ||
      java.util.Arrays.binarySearch(arr, i.asInstanceOf[Long]) < 0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, i) => {
      val map = ctx.addReferenceObj("dvVectors", vectors,
        "java.util.HashMap<org.apache.spark.unsafe.types.UTF8String, long[]>")
      val arr = ctx.freshName("dvArr")
      s"""
         |long[] $arr = (long[]) $map.get($f);
         |${ev.value} = $arr == null ||
         |  java.util.Arrays.binarySearch($arr, $i) < 0;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DvLiveRow =
    copy(left = newLeft, right = newRight)
}
