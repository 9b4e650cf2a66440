package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) interleave over 2–4 quantized dimensions, as PURE
  * built-in column algebra — shift/and/or of codegen'd expressions, so
  * the whole code computes inside one WholeStageCodegen pass (no UDF, no
  * custom Expression needed: composition is preference (a) from the
  * operator playbook).
  *
  * Why it exists: `clusterBy` (repartitionByRange + sortWithinPartitions)
  * gives each output file a tight min/max range on ONE sort prefix —
  * filters on the second sort column prune nothing once the first is
  * spread. Sorting by the Morton code of the quantized columns instead
  * bounds EVERY dimension per file (each file covers a small
  * square/cube/hypercube of the quantized grid, not a thin full-width
  * stripe), so parquet/ORC row-group stats prune scans filtered on ANY
  * dimension. This is the standard multi-dimensional data-skipping
  * layout at 100 TB; the code is written once at layout time and costs
  * nothing at read time.
  *
  * The same arithmetic is emitted as ANSI SQL by [[interleaveSql]] so the
  * DuckDB oracle replays bit-identical codes (g4_zorder_cluster). */
object ZOrder {

  private def checkDims(d: Int, bits: Int): Unit = {
    require(d >= 2 && d <= 4, s"zorder takes 2-4 dimensions, got $d")
    require(bits >= 1 && bits * d <= 62,
      s"zorder: bits ($bits) x dims ($d) must fit a positive BIGINT " +
        s"(bits*dims <= 62)")
  }

  /** Interleave the low `bits` bits of each dimension: bit `i` of
    * dimension `d` lands at position `i*D + d` — the 2-dim classic
    * z = Σ ((x>>i)&1)<<2i | ((y>>i)&1)<<(2i+1), generalized. Inputs are
    * cast to BIGINT; callers quantize to non-negative values < 2^bits
    * first (quantization choice — modulo, range bucketing, percentile
    * binning — is the caller's layout decision). */
  def interleave(dims: Seq[Column], bits: Int): Column = {
    checkDims(dims.size, bits)
    val ls = dims.map(_.cast("bigint"))
    val d = dims.size
    (for (i <- 0 until bits; (c, j) <- ls.zipWithIndex) yield
      shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * d + j))
      .reduce(_ bitwiseOR _)
  }

  /** Two-dimension face (x at even bit positions, y at odd). */
  def interleave(x: Column, y: Column, bits: Int): Column =
    interleave(Seq(x, y), bits)

  /** The exact same interleave as an ANSI SQL expression string (DuckDB
    * and Spark SQL share the `>> << & |` operator semantics on BIGINT).
    * Parenthesized per term; wrap the whole string in parens before
    * aliasing. */
  def interleaveSql(names: Seq[String], bits: Int): String = {
    checkDims(names.size, bits)
    val d = names.size
    (for (i <- 0 until bits; (n, j) <- names.zipWithIndex) yield
      s"((($n >> $i) & 1) << ${i * d + j})")
      .mkString(" | ")
  }

  /** Two-dimension face. */
  def interleaveSql(x: String, y: String, bits: Int): String =
    interleaveSql(Seq(x, y), bits)

  /** Inverse of [[interleave]] for dimension `dim` of `dims` — used by
    * the spec to prove the code is a bijection (z determines every
    * coordinate, which is exactly why per-file z-ranges bound them all). */
  def deinterleave(z: Long, dim: Int, dims: Int, bits: Int): Long =
    (0 until bits).map(i => ((z >> (i * dims + dim)) & 1L) << i).sum

  /** Two-dimension face (parity 0 = x, 1 = y). */
  def deinterleave(z: Long, parity: Int, bits: Int): Long =
    deinterleave(z, parity, 2, bits)

  /** Z-order LAYOUT: range-repartition + sort by the Morton code of the
    * 2–4 linearly-quantized NUMERIC columns, then drop the key (a
    * projection keeps row order, no exchange). Quantization bounds come
    * from ONE column-pruned min/max aggregate — the same cost class as
    * surrogate_key's bound probe, paid once at write time. NULL dims land
    * in cell 0 (they sort first, like a range layout's null ordering).
    * Shared by the `clusterBy: zorder(..)` sink and graft_table OPTIMIZE.
    * `parts`: explicit output partition count (OPTIMIZE's file target);
    * None uses the session shuffle partitioning (+AQE coalescing).
    *
    * `partitionBy`: z-order WITHIN a hive-partitioned layout — the range
    * key becomes (partition cols..., zkey), so each output task holds one
    * contiguous z-range of one (or few) partition values and the
    * partitioned staging write keeps the dir layout while every file
    * still covers a small quantized cell inside its partition. */
  def zLayout(df: org.apache.spark.sql.DataFrame, dims: Seq[String],
      bits: Int, parts: Option[Int],
      partitionBy: Seq[String]): org.apache.spark.sql.DataFrame = {
    checkDims(dims.size, bits)
    dims.foreach { c =>
      require(df.schema(c).dataType
          .isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"zorder layout: column '$c' is ${df.schema(c).dataType.sql} — " +
          "z-order needs numeric dimensions (quantization is linear min->max)")
    }
    val st = df.agg(
      dims.flatMap(c => Seq(min(col(c).cast("double")),
        max(col(c).cast("double")))).head,
      dims.flatMap(c => Seq(min(col(c).cast("double")),
        max(col(c).cast("double")))).tail: _*).head()
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
      interleave(dims.zipWithIndex.map { case (c, i) =>
        quant(c, st.getDouble(2 * i), st.getDouble(2 * i + 1))
      }, bits))
    val keyCols = partitionBy.map(col) :+ col("__graft_zkey")
    parts.fold(keyed.repartitionByRange(keyCols: _*))(
        n => keyed.repartitionByRange(n, keyCols: _*))
      .sortWithinPartitions(keyCols: _*)
      .drop("__graft_zkey")
  }

  /** Two-dimension face (the historical signature). */
  def zLayout(df: org.apache.spark.sql.DataFrame, x: String, y: String,
      bits: Int, parts: Option[Int] = None,
      partitionBy: Seq[String] = Nil): org.apache.spark.sql.DataFrame =
    zLayout(df, Seq(x, y), bits, parts, partitionBy)
}
