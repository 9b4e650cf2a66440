package graft.tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Incrementally-maintained materialized aggregate over a [[GraftTable]].
  *
  * The MV is itself a graft_table holding `keys ++ aggs` — one row per
  * group — refreshed from the base table's change feed instead of a full
  * rescan. The contract the maintenance leans on:
  *
  *  - DECOMPOSABLE aggregates only (count / sum / min / max): each has a
  *    merge function (count→sum, sum→sum, min→min, max→max), so
  *    `agg(old ∪ Δ) = merge(agg(old), agg(Δ))` and a refresh touches
  *    O(|MV| + |Δ|) rows — at a 100 TB base with a bounded group space,
  *    that is the entire point. avg ships as sum+count (finalize at read
  *    time); holistic aggregates (median, distinct) need the base scan.
  *  - APPEND-ONLY feed: min/max (and the algebra above) are only sound
  *    when no base row is retracted. `GraftTable.appendOnlySince` checks
  *    the consumed version range; a merge/delete/overwrite in it forces
  *    an automatic FULL recompute of that refresh (the production MV
  *    behavior: incremental when the log allows, correct always).
  *  - EXACTLY-ONCE cursor: the consumed base version rides the MV's own
  *    commit as a txn action `(appId = "mv:" + base, batchId = version)`
  *    — data advance and cursor advance are ONE atomic commit, so a
  *    crash between refresh and any external bookkeeping cannot double-
  *    apply a delta (the rerun sees `lastTxn ≥ baseVersion` and no-ops).
  *
  * Refresh plan shape: the delta aggregates FIRST (map-side partial
  * combine shrinks it to ≤1 row per touched group before the shuffle),
  * then merges into the MV via the keyed lakehouse MERGE — only MV files
  * containing touched groups are rewritten.
  */
object MaterializedView {

  /** One maintained aggregate: `fn` over SQL expression `expr` AS `out`.
    * `approx_distinct` stores a mergeable HLL SKETCH (binary) — read it
    * through [[estimated]] or `hll_sketch_estimate` — the only way a
    * distinct count can be maintained incrementally at all (the exact
    * version is not decomposable; this is the 100 TB trade every
    * warehouse MV makes). */
  final case class AggSpec(fn: String, expr: String, out: String) {
    require(Set("count", "sum", "min", "max", "approx_distinct")(fn),
      s"materialized view: aggregate '$fn' is not decomposable — " +
        "supported: count | sum | min | max | approx_distinct (HLL " +
        "sketch; avg = sum + count)")
  }

  private def mvAppId(base: String): String =
    "mv:" + java.nio.file.Paths.get(base).toAbsolutePath.normalize.toString

  private def aggCols(aggs: Seq[AggSpec]): Seq[Column] = aggs.map {
    // SQL COUNT semantics, both forms: COUNT(*) for an empty/"*"/"1"
    // expr, COUNT(expr) — nulls excluded — otherwise. Both are
    // decomposable (merge = sum), so the distinction costs nothing.
    case AggSpec("count", e, out)
      if e == null || e.trim.isEmpty || e.trim == "*" || e.trim == "1" =>
      count(lit(1)).as(out)
    case AggSpec("count", e, out) => count(expr(e)).as(out)
    case AggSpec("approx_distinct", e, out) =>
      expr(s"hll_sketch_agg($e)").as(out)
    case AggSpec(fn, e, out) => expr(s"$fn($e)").as(out)
  }

  /** Merge functions over the MV's own columns (count becomes sum,
    * sketches union). */
  private def mergeCols(aggs: Seq[AggSpec]): Seq[Column] = aggs.map {
    case AggSpec("count", _, out) => sum(col(out)).as(out)
    case AggSpec("approx_distinct", _, out) =>
      expr(s"hll_union_agg(`$out`)").as(out)
    case AggSpec(fn, _, out) => expr(s"$fn(`$out`)").as(out)
  }

  /** Read helper: replace each approx_distinct SKETCH column with its
    * estimate (bigint), leaving everything else as stored. */
  def estimated(mv: DataFrame, aggs: Seq[AggSpec]): DataFrame =
    aggs.filter(_.fn == "approx_distinct").foldLeft(mv)((df, a) =>
      df.withColumn(a.out, expr(s"hll_sketch_estimate(`${a.out}`)")))

  /** Aggregate-output TYPES drift across refreshes (a re-merged DECIMAL
    * sum widens its precision) — pin every refresh to the MV's logged
    * schema: same order, same types. Nullability is not pinned; the
    * table's schema check ignores it (plan metadata, not data shape). */
  private def conformTo(df: DataFrame, ddl: String): DataFrame = {
    val want = StructType.fromDDL(ddl)
    df.select(want.fields.toSeq.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)
  }

  /** Bring `mv` up to date with `base`'s latest version. Returns the new
    * MV version, or None when already current (incl. crash-replay). */
  def refresh(spark: SparkSession, base: String, mv: String,
      keys: Seq[String], aggs: Seq[AggSpec]): Option[Long] = {
    require(keys.nonEmpty, "materialized view needs group keys")
    require(aggs.nonEmpty, "materialized view needs at least one aggregate")
    val dupOut = (keys ++ aggs.map(_.out)).groupBy(identity)
      .collect { case (n, g) if g.size > 1 => n }
    require(dupOut.isEmpty,
      s"materialized view: duplicate output column(s) [${dupOut.mkString(", ")}]")
    val baseV = GraftTable.latestVersion(base).getOrElse(
      throw new IllegalArgumentException(s"not a graft_table: $base"))
    val appId = mvAppId(base)
    val last = GraftTable.lastTxn(mv, appId)
    if (last.exists(_ >= baseV)) return None // current (or a crash replay)

    val from = last.getOrElse(0L)
    if (last.isDefined && GraftTable.appendOnlySince(base, from, baseV)) {
      // INCREMENTAL: aggregate only the delta, merge into the MV
      val delta = GraftTable.changes(spark, base, from, Some(baseV))
        .drop("_commit_version")
      val deltaAgg = delta.groupBy(keys.map(col): _*).agg(
        aggCols(aggs).head, aggCols(aggs).tail: _*)
      val mvDdl = GraftTable.snapshot(mv).schemaDdl
      // only groups the delta touched need re-merging; the semi-joined
      // old rows are ≤1 per touched group
      val oldTouched = GraftTable.read(spark, mv)
        .join(deltaAgg.select(keys.map(col): _*), keys, "left_semi")
      val combined = conformTo(
        oldTouched.unionByName(conformTo(deltaAgg, mvDdl))
          .groupBy(keys.map(col): _*)
          .agg(mergeCols(aggs).head, mergeCols(aggs).tail: _*),
        mvDdl)
      Some(GraftTable.merge(spark, mv, combined, keys,
        txn = Some(appId -> baseV)))
    } else {
      // FULL: first materialization, or the base rewrote rows the feed
      // cannot retract — recompute from the snapshot the cursor names
      val full = GraftTable.read(spark, base, asOf = Some(baseV))
        .groupBy(keys.map(col): _*).agg(
          aggCols(aggs).head, aggCols(aggs).tail: _*)
      Some(GraftTable.write(spark, full, mv, "overwrite",
        txn = Some(appId -> baseV)))
    }
  }
}
