package graft.ext

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** SURVEY.md §2.M5 — a `TypedImperativeAggregate` sketch: the k smallest
  * 64-bit hashes of the input values (a KMV / bottom-k sketch).
  *
  * Chosen over a true reservoir sample because it is DETERMINISTIC and
  * merge-invariant: the same input multiset yields the same sketch under
  * any partitioning or merge order (min-k of a set is associative +
  * commutative), which a reservoir is not. The sketch supports distinct-
  * count estimation ((k-1)/kth-smallest-fraction) and set-similarity
  * (bottom-k Jaccard) at 100 TB scale: constant memory per group,
  * partial+final merge like any built-in aggregate.
  *
  * X-tier (engine-internal hash, no SQL-oracle twin); laws are property-
  * tested in ExtensionsSpec.
  */
case class BottomKSketch(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bottomk"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_bottomk: k must be >= 1")

  override def createAggregationBuffer(): mutable.TreeSet[Long] = mutable.TreeSet.empty

  private def hash64(v: Any): Long = v match {
    case l: Long => scala.util.hashing.MurmurHash3.bytesHash(
      ByteBuffer.allocate(8).putLong(l).array(), 0x9747b28c).toLong << 32 |
      (scala.util.hashing.MurmurHash3.bytesHash(
        ByteBuffer.allocate(8).putLong(l).array(), 0x85ebca6b).toLong & 0xffffffffL)
    case s => scala.util.hashing.MurmurHash3.stringHash(s.toString, 0x9747b28c).toLong << 32 |
      (scala.util.hashing.MurmurHash3.stringHash(s.toString, 0x85ebca6b).toLong & 0xffffffffL)
  }

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf += hash64(v)
      if (buf.size > k) buf -= buf.last
    }
    buf
  }

  override def merge(a: mutable.TreeSet[Long], b: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    a ++= b
    while (a.size > k) a -= a.last
    a
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = mutable.TreeSet.empty[Long]
    (0 until n).foreach(_ => s += bb.getLong)
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BottomKSketch =
    copy(child = c.head)
}
