package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical as-of join: a single forward merge pass over two sides that
  * are hash-partitioned on their keys and sorted by (keys..., ts) — the
  * same distribution/ordering contract as a sort-merge join, declared via
  * `requiredChildDistribution` / `requiredChildOrdering` so
  * `EnsureRequirements` inserts the exchanges and sorts (and AQE can
  * re-plan them).
  *
  * Scale posture: per partition the pass is O(|L| + |R|) with one retained
  * right row (`lastMatch`) — no per-key buffering, no window state, no
  * nested loop. Right rows are copied once on advance (UnsafeRow iterators
  * reuse their buffer); left rows stream through unchanged. Skewed keys
  * behave like a skewed SMJ: one shuffle partition gets big but memory
  * stays O(1) per partition.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val outAttrs = output
    val lRdd = left.execute()
    val rRdd = right.execute()
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"as-of join children must be co-partitioned: " +
        s"${lRdd.getNumPartitions} vs ${rRdd.getNumPartitions}")
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsB = BindReferences.bindReference(lTsExpr, lOut)
      val rTsB = BindReferences.bindReference(rTsExpr, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      // current un-consumed right row; copied because the shuffle-read
      // iterator reuses its UnsafeRow buffer across next() calls
      var rRow: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
      var lastMatch: InternalRow = null // already a copy — safe to retain
      def advanceRight(): Unit =
        rRow = if (rIter.hasNext) rIter.next().copy() else null
      lIter.map { l =>
        val lk = lKeyProj(l)
        // a retained match from an earlier key can never apply again
        if (lastMatch != null && keyOrd.compare(rKeyProj(lastMatch), lk) != 0)
          lastMatch = null
        val lts = lTsB.eval(l)
        // SQL equality semantics: a NULL key equals nothing (so a left row
        // with any null key matches no right row, and null-key right rows
        // are never retained — they sort first and are skipped via c < 0);
        // a NULL left ts compares unknown-to-everything: no match.
        if (lts == null || lk.anyNull) {
          lastMatch = null
        } else {
          var scanning = rRow != null
          while (scanning) {
            val c = keyOrd.compare(rKeyProj(rRow), lk)
            if (c < 0) {
              advanceRight(); scanning = rRow != null
            } else if (c == 0) {
              val rts = rTsB.eval(rRow)
              // Defensive: the AsOf.join wrapper filters null right ts,
              // but a directly-built plan (or a future rewrite) may not —
              // a null ts can never be "the latest at-or-before", so skip
              // the row instead of NPE-ing in tsOrd.
              if (rts == null) { advanceRight(); scanning = rRow != null }
              else if (tsOrd.lteq(rts, lts)) {
                lastMatch = rRow
                advanceRight(); scanning = rRow != null
              } else scanning = false
            } else scanning = false
          }
        }
        resultProj(joined(l, if (lastMatch != null) lastMatch else nullRight))
      }
    }
  }
}
