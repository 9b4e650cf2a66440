package graft.tables

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** The snapshot of one graft_table version as a Spark [[FileIndex]] —
  * the Delta/TahoeFileIndex recipe: the table's OWN log is the file
  * listing, so a read never touches the filesystem for discovery, and
  * `listFiles` prunes whole files against the logged per-column min/max
  * using the query's own pushed `dataFilters`. A user writes a plain
  * `.where(...)` (or a YAML `filter:`) and the scan reads only the
  * files that can match — no `rangeCol`-style declaration, no custom
  * reader: behind the index sits Spark's native vectorized parquet
  * scan, with parquet row-group pruning still applying INSIDE each
  * surviving file.
  *
  * Planning cost is O(live files) driver metadata per query — the same
  * contract every lakehouse format ships at 100 TB. Pruning is
  * conservative by construction (see GraftTable.pruneByExprs): a
  * conjunct that is not understood, or a file without stats for the
  * column, keeps the file.
  */
private[graft] class GraftFileIndex(
    root: String,
    liveFiles: Seq[String], // relative paths, snapshot order
    fileStats: Map[String, com.fasterxml.jackson.databind.JsonNode],
    fileSizes: Map[String, Long]) extends FileIndex {

  /** Last `listFiles` pruning outcome: (kept, total) — spec/ops
    * visibility that a filter actually reached the index. */
  @volatile private[graft] var lastPrune: Option[(Int, Int)] = None
  /** How many `listFiles` calls carried at least one data filter. */
  @volatile private[graft] var filteredListings: Int = 0

  private val absRoot = Paths.get(root).toAbsolutePath.normalize

  override def rootPaths: Seq[HPath] = Seq(new HPath(absRoot.toUri))

  override def partitionSchema: StructType = StructType(Nil)

  override def refresh(): Unit = () // snapshot-pinned: the log is immutable

  override def sizeInBytes: Long = {
    // logged sizes when present (zero IO); stat only the stragglers from
    // logs written before sizes were recorded — bounded by file count
    var total = 0L
    liveFiles.foreach { f =>
      total += fileSizes.getOrElse(f, {
        val p = absRoot.resolve(f)
        if (Files.exists(p)) Files.size(p) else 0L
      })
    }
    total
  }

  override def inputFiles: Array[String] =
    liveFiles.map(f => absRoot.resolve(f).toString).toArray

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept =
      if (dataFilters.isEmpty) liveFiles
      else GraftTable.pruneByExprs(fileStats.get _, liveFiles, dataFilters)
    if (dataFilters.nonEmpty) {
      lastPrune = Some((kept.size, liveFiles.size))
      filteredListings += 1
    }
    val statuses = kept.map { f =>
      val p = absRoot.resolve(f)
      val len = fileSizes.getOrElse(f, Files.size(p))
      new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L,
        new HPath(p.toUri))
    }.toArray
    Seq(PartitionDirectory(InternalRow.empty, statuses))
  }
}
