package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) interleave over two quantized dimensions, as PURE
  * built-in column algebra — shift/and/or of codegen'd expressions, so
  * the whole code computes inside one WholeStageCodegen pass (no UDF, no
  * custom Expression needed: composition is preference (a) from the
  * operator playbook).
  *
  * Why it exists: `clusterBy` (repartitionByRange + sortWithinPartitions)
  * gives each output file a tight min/max range on ONE sort prefix —
  * filters on the second sort column prune nothing once the first is
  * spread. Sorting by the Morton code of two quantized columns instead
  * bounds BOTH dimensions per file (each file covers a small square of
  * the (x, y) grid, not a thin full-width stripe), so parquet/ORC
  * row-group stats prune scans filtered on EITHER dimension. This is the
  * standard multi-dimensional data-skipping layout at 100 TB; the code is
  * written once at layout time and costs nothing at read time.
  *
  * The same arithmetic is emitted as ANSI SQL by [[interleaveSql]] so the
  * DuckDB oracle replays bit-identical codes (g4_zorder_cluster). */
object ZOrder {

  /** Interleave the low `bits` bits of `x` (even positions) and `y` (odd
    * positions): z = Σ ((x>>i)&1)<<2i | ((y>>i)&1)<<(2i+1). Inputs are
    * cast to BIGINT; callers quantize to non-negative values < 2^bits
    * first (quantization choice — modulo, range bucketing, percentile
    * binning — is the caller's layout decision). */
  def interleave(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xl = x.cast("bigint")
    val yl = y.cast("bigint")
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The exact same interleave as an ANSI SQL expression string (DuckDB
    * and Spark SQL share the `>> << & |` operator semantics on BIGINT).
    * Parenthesized per term; wrap the whole string in parens before
    * aliasing. */
  def interleaveSql(x: String, y: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" | ")
  }

  /** Inverse of [[interleave]] for one dimension (parity 0 = x, 1 = y) —
    * used by the spec to prove the code is a bijection (z determines both
    * coordinates, which is exactly why per-file z-ranges bound both). */
  def deinterleave(z: Long, parity: Int, bits: Int): Long =
    (0 until bits).map(i => ((z >> (2 * i + parity)) & 1L) << i).sum

  /** Z-order LAYOUT: range-repartition + sort by the Morton code of the
    * two linearly-quantized NUMERIC columns, then drop the key (a
    * projection keeps row order, no exchange). Quantization bounds come
    * from ONE column-pruned min/max aggregate — the same cost class as
    * surrogate_key's bound probe, paid once at write time. NULL dims land
    * in cell 0 (they sort first, like a range layout's null ordering).
    * Shared by the `clusterBy: zorder(..)` sink and graft_table OPTIMIZE.
    * `parts`: explicit output partition count (OPTIMIZE's file target);
    * None uses the session shuffle partitioning (+AQE coalescing). */
  /** `partitionBy`: z-order WITHIN a hive-partitioned layout — the range
    * key becomes (partition cols..., zkey), so each output task holds one
    * contiguous z-range of one (or few) partition values and the
    * partitioned staging write keeps the dir layout while every file
    * still covers a small (x, y) square inside its partition. */
  def zLayout(df: org.apache.spark.sql.DataFrame, x: String, y: String,
      bits: Int, parts: Option[Int] = None,
      partitionBy: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    Seq(x, y).foreach { c =>
      require(df.schema(c).dataType
          .isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"zorder layout: column '$c' is ${df.schema(c).dataType.sql} — " +
          "z-order needs numeric dimensions (quantization is linear min->max)")
    }
    val st = df.agg(
      min(col(x).cast("double")), max(col(x).cast("double")),
      min(col(y).cast("double")), max(col(y).cast("double"))).head()
    if (st.anyNull) return df // empty (or all-null) input: no layout
    val cells = (1L << bits).toDouble
    def quant(c: String, lo: Double, hi: Double) = {
      val span = math.max(hi - lo, java.lang.Double.MIN_VALUE)
      least(greatest(
        floor((coalesce(col(c).cast("double"), lit(lo)) - lit(lo))
          / lit(span) * lit(cells)).cast("bigint"),
        lit(0L)), lit((1L << bits) - 1L))
    }
    val keyed = df.withColumn("__graft_zkey",
      interleave(quant(x, st.getDouble(0), st.getDouble(1)),
        quant(y, st.getDouble(2), st.getDouble(3)), bits))
    val keyCols = partitionBy.map(col) :+ col("__graft_zkey")
    parts.fold(keyed.repartitionByRange(keyCols: _*))(
        n => keyed.repartitionByRange(n, keyCols: _*))
      .sortWithinPartitions(keyCols: _*)
      .drop("__graft_zkey")
  }
}
