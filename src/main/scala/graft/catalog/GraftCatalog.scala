package graft.catalog

import java.nio.file.{Files, Path, Paths}
import java.util.Collections

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException,
  NoSuchTableException, NonEmptyNamespaceException,
  NamespaceAlreadyExistsException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Column => CatColumn,
  Identifier, NamespaceChange, SupportsNamespaces, SupportsRead,
  SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo,
  SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, Filter => V1Filter,
  InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.Column

import graft.tables.GraftTable

/** Name-addressable face of the graft_table lakehouse format: a DSv2
  * `TableCatalog` mapping `graft.db.tbl` to a graft_table root under a
  * warehouse directory (`spark.sql.catalog.graft.warehouse`), so
  * `spark.sql("SELECT … FROM graft.db.tbl")`, `INSERT INTO`,
  * `CREATE/DROP TABLE`, `saveAsTable("graft.db.tbl")` and time travel
  * (`VERSION AS OF` / `TIMESTAMP AS OF`) all work without a path string
  * in sight — the reference platform's "single reusable architecture"
  * bar (reference README.md:2) wants pipelines to address tables by
  * name, not by copy-pasted paths.
  *
  * Register per session (runtime-settable, no restart):
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/graft")
  * }}}
  *
  * Layout: `<warehouse>/<ns...>/<table>` — a namespace is a directory, a
  * table is a directory with a `_graft_log`. All catalog operations are
  * O(metadata); the table content protocol (OCC, DVs, column mapping,
  * time travel) is [[GraftTable]]'s, shared verbatim with the
  * path-addressed API.
  *
  * Read/write planning goes through Spark's public V1-fallback connector
  * faces — the same route Spark's own JDBC v2 catalog takes:
  *  - [[V1Scan]]: the scan compiles to the existing [[GraftTable.read]]
  *    plan (GraftFileIndex file skipping, DV filtering, column mapping,
  *    parquet vectorized reader — all reused, not reimplemented). Pushed
  *    filters land on the inner plan, so log-stats pruning and parquet
  *    pushdown fire exactly as in the path API; `needConversion = false`
  *    hands Spark the inner plan's InternalRows with zero per-row
  *    conversion.
  *  - [[V1Write]]: INSERT INTO / saveAsTable compile to
  *    [[GraftTable.write]] (append, or overwrite via SupportsTruncate) —
  *    atomic commits, OCC retries, constraints, CDF all apply.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: Path = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Paths.get(Option(options.get("warehouse"))
      .getOrElse("spark-warehouse/graft"))
  }

  override def name(): String = catalogName

  private def nsDir(ns: Array[String]): Path =
    ns.foldLeft(warehouse)(_.resolve(_))
  private def tblDir(ident: Identifier): Path =
    nsDir(ident.namespace).resolve(ident.name)

  // -- namespaces ------------------------------------------------------------

  override def namespaceExists(ns: Array[String]): Boolean =
    // the empty namespace IS the warehouse root: createTable permits a
    // root-level table, so SHOW TABLES against the default namespace
    // must answer rather than throw NoSuchNamespace
    ns.isEmpty || (Files.isDirectory(nsDir(ns)) &&
      !GraftTable.isTable(nsDir(ns).toString))

  override def listNamespaces(): Array[Array[String]] = {
    if (!Files.isDirectory(warehouse)) return Array.empty
    scala.util.Using.resource(Files.list(warehouse))(
      _.iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          !GraftTable.isTable(p.toString))
        .map(p => Array(p.getFileName.toString)).toArray)
      .sortBy(_.mkString("."))
  }

  override def listNamespaces(ns: Array[String]): Array[Array[String]] = {
    if (ns.isEmpty) return listNamespaces()
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    scala.util.Using.resource(Files.list(nsDir(ns)))(
      _.iterator().asScala
        .filter(p => Files.isDirectory(p) && !GraftTable.isTable(p.toString))
        .map(p => ns :+ p.getFileName.toString).toArray)
      .sortBy(_.mkString("."))
  }

  override def loadNamespaceMetadata(
      ns: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    Collections.emptyMap()
  }

  override def createNamespace(ns: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    if (namespaceExists(ns)) throw new NamespaceAlreadyExistsException(ns)
    Files.createDirectories(nsDir(ns))
  }

  override def alterNamespace(ns: Array[String],
      changes: NamespaceChange*): Unit = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    throw new UnsupportedOperationException(
      "graft catalog namespaces carry no metadata to alter")
  }

  override def dropNamespace(ns: Array[String],
      cascade: Boolean): Boolean = {
    // the root namespace is the warehouse itself — never deletable
    require(ns.nonEmpty, "graft catalog: cannot drop the root namespace")
    if (!namespaceExists(ns)) return false
    if (!cascade && listTables(ns).nonEmpty)
      throw new NonEmptyNamespaceException(ns)
    deleteRecursively(nsDir(ns)); true
  }

  // -- tables ----------------------------------------------------------------

  override def listTables(ns: Array[String]): Array[Identifier] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    if (!Files.isDirectory(nsDir(ns))) return Array.empty // root, no warehouse yet
    scala.util.Using.resource(Files.list(nsDir(ns)))(
      _.iterator().asScala
        .filter(p => GraftTable.isTable(p.toString))
        .map(p => Identifier.of(ns, p.getFileName.toString)).toArray)
      .sortBy(_.name)
  }

  override def tableExists(ident: Identifier): Boolean =
    GraftTable.isTable(tblDir(ident).toString)

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new GraftNamedTable(tblDir(ident).toString,
      (catalogName +: ident.namespace :+ ident.name).mkString("."), None)
  }

  /** `VERSION AS OF v` — time travel straight off the log. */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    require(version.nonEmpty && version.forall(_.isDigit),
      s"graft catalog: VERSION AS OF wants a numeric version, got '$version'")
    new GraftNamedTable(tblDir(ident).toString,
      (catalogName +: ident.namespace :+ ident.name).mkString("."),
      Some(version.toLong))
  }

  /** `TIMESTAMP AS OF ts` — Spark hands epoch MICROseconds. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val root = tblDir(ident).toString
    new GraftNamedTable(root,
      (catalogName +: ident.namespace :+ ident.name).mkString("."),
      Some(GraftTable.versionAtTimestamp(root, timestamp / 1000L)))
  }

  override def createTable(ident: Identifier, columns: Array[CatColumn],
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(
      Seq(catalogName) ++ ident.namespace :+ ident.name)
    if (ident.namespace.nonEmpty && !namespaceExists(ident.namespace))
      throw new NoSuchNamespaceException(ident.namespace)
    val pb = partitions.toSeq.map { t =>
      require(t.name == "identity" && t.references.length == 1,
        s"graft catalog: only identity PARTITIONED BY (col) is supported, " +
          s"got $t")
      t.references.head.fieldNames.mkString(".")
    }
    // Spark stuffs engine bookkeeping (provider/owner/location/…) into
    // the property map; only user-set properties belong in the log
    val reserved = Set(TableCatalog.PROP_PROVIDER, TableCatalog.PROP_OWNER,
      TableCatalog.PROP_LOCATION, TableCatalog.PROP_EXTERNAL,
      TableCatalog.PROP_COMMENT, TableCatalog.PROP_TABLE_TYPE,
      TableCatalog.PROP_IS_MANAGED_LOCATION, TableCatalog.PROP_COLLATION)
    val props = properties.asScala.toMap.filterNot { case (k, _) =>
      reserved(k) || k.startsWith(TableCatalog.OPTION_PREFIX)
    }
    val schema = StructType(columns.map(c =>
      org.apache.spark.sql.types.StructField(c.name, c.dataType, c.nullable)))
    GraftTable.create(tblDir(ident).toString, schema, pb, props)
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val root = tblDir(ident).toString
    changes.foreach {
      case s: TableChange.SetProperty =>
        GraftTable.setProperty(root, s.property, Some(s.value))
      case r: TableChange.RemoveProperty =>
        GraftTable.setProperty(root, r.property, None)
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          "graft catalog: nested column rename is not supported")
        GraftTable.renameColumn(root, r.fieldNames.head, r.newName)
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1,
          "graft catalog: nested column drop is not supported")
        GraftTable.dropColumn(root, d.fieldNames.head)
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER TABLE change $other")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    deleteRecursively(tblDir(ident)); true
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    if (!tableExists(from)) throw new NoSuchTableException(from)
    if (tableExists(to)) throw new TableAlreadyExistsException(
      Seq(catalogName) ++ to.namespace :+ to.name)
    if (to.namespace.nonEmpty && !namespaceExists(to.namespace))
      throw new NoSuchNamespaceException(to.namespace)
    Files.move(tblDir(from), tblDir(to))
  }

  private def deleteRecursively(p: Path): Unit =
    scala.util.Using.resource(Files.walk(p))(
      _.sorted(java.util.Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.deleteIfExists(_)))
}

object GraftCatalog {
  /** Resolve `db.tbl` (any namespace depth) to its graft_table root via
    * the session's `spark.sql.catalog.<cat>.warehouse` — the YAML
    * `table:` routing face, shared by PipelineRunner so a config names
    * tables exactly like SQL does. */
  def tablePath(spark: SparkSession, table: String,
      catalog: String = "graft"): String = {
    val wh = spark.conf.getOption(s"spark.sql.catalog.$catalog.warehouse")
      .getOrElse(throw new IllegalArgumentException(
        s"table: '$table' needs spark.sql.catalog.$catalog.warehouse set " +
          "(the graft catalog's root directory)"))
    val parts = table.split("\\.").toSeq
    // non-empty AND no path syntax: a part containing a separator (or
    // '..', or an absolute segment) would make Path.resolve escape the
    // warehouse entirely and silently address a table outside the
    // catalog layout
    require(parts.forall(p => p.nonEmpty && !p.contains('/') &&
        !p.contains('\\') && p != ".." && p != "."),
      s"malformed table name '$table'")
    parts.foldLeft(Paths.get(wh))(_.resolve(_)).toString
  }
}

/** One named graft_table: batch read through [[V1Scan]] onto the
  * existing [[GraftTable.read]] plan, batch write through [[V1Write]]
  * onto [[GraftTable.write]]. `asOf` pins time travel. */
private[graft] class GraftNamedTable(val root: String, ident: String,
    asOf: Option[Long]) extends Table with SupportsRead with SupportsWrite {

  override def name(): String = ident

  override def schema(): StructType =
    StructType.fromDDL(GraftTable.snapshot(root, asOf).schemaDdl)

  override def partitioning(): Array[Transform] =
    GraftTable.partitioning(root, asOf)
      .map(c => Expressions.identity(c)).toArray

  override def properties(): java.util.Map[String, String] =
    GraftTable.tableProperties(root, asOf).asJava

  override def capabilities(): java.util.Set[TableCapability] =
    // V1_BATCH_WRITE (not BATCH_WRITE): the planner only routes an
    // AppendData/Overwrite through V1Write.toInsertableRelation when the
    // table declares the V1 capability — with BATCH_WRITE it calls
    // Write.toBatch and throws. MICRO_BATCH_READ: readStream.table(name)
    // delivers the table's own columns incrementally (Delta's shape —
    // the path source remains the face for _commit_version/_change_type
    // enriched feeds, whose schema differs from the table's).
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(root, asOf, schema(), options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(asOf.isEmpty,
      s"graft catalog: cannot write to a time-travel read of $ident")
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, ow: Boolean): Unit = {
              GraftTable.write(data.sparkSession, data, root,
                if (overwrite || ow) "overwrite" else "append")
              ()
            }
          }
      }
    }
  }
}

/** Column pruning + filter pushdown land on the INNER [[GraftTable.read]]
  * plan, where the GraftFileIndex prunes whole files from logged min/max
  * stats and the parquet reader gets its own row-group pushdown — the
  * catalog adds a name, not a second scan implementation.
  *
  * Pushdown safety: every pushed filter is ALSO returned as a residual
  * (Spark re-evaluates above the scan), and only filters with an EXACT
  * Column translation are applied to the inner plan — applying a
  * conjunct of the predicate is always sound for a filter (subset), and
  * partially-translated NOT/OR shapes are never applied at all. */
private[graft] class GraftScanBuilder(root: String, asOf: Option[Long],
    full: StructType,
    options: CaseInsensitiveStringMap) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = full
  private var pushed: Array[V1Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[V1Filter]): Array[V1Filter] = {
    pushed = filters.filter(f => translate(f).isDefined)
    filters // all residual: Spark re-applies — double-eval is free, a
            // wrongly-dropped row is not
  }

  override def pushedFilters(): Array[V1Filter] = pushed

  override def build(): Scan = {
    val req = required; val flt = pushed
    new V1Scan {
      override def readSchema(): StructType = req
      // readStream.table("graft.db.tbl"): the same pruned schema streams
      // through the existing micro-batch machinery (offsets = commit
      // versions, exactly-once via the query checkpoint). The catalog
      // face delivers the TABLE's columns — the path-addressed source
      // remains the face for _commit_version/_change_type enriched
      // feeds, whose schema differs from the table's.
      override def toMicroBatchStream(checkpointLocation: String)
          : graft.tables.GraftMicroBatchStream = {
        require(asOf.isEmpty,
          "graft catalog: cannot stream a time-travel read")
        require(!options.getBoolean("withImages", false),
          "graft catalog: withImages adds _change_type to the schema — " +
            "stream the change feed via the path source " +
            "(format graft.tables.GraftTableStreamSource)")
        // same fail-loud-at-construction type contract as the path
        // source: unsupported column types are named here, not mid-batch
        graft.tables.GraftTableStreamSource.streamSchema(root)
        new graft.tables.GraftMicroBatchStream(root, req,
          graft.tables.GraftTableStreamSource
            .resolveStartingVersion(root, options),
          options.getBoolean("skipChangeCommits", false),
          options.getLong("maxVersionsPerTrigger", Long.MaxValue))
      }
      override def toV1TableScan[T <: BaseRelation with TableScan](
          context: SQLContext): T = {
        new BaseRelation with TableScan {
          override def sqlContext: SQLContext = context
          override def schema: StructType = req
          // the inner plan's output IS InternalRow (same engine, same
          // codegen) — no per-row Row conversion
          override def needConversion: Boolean = false
          override def buildScan(): RDD[Row] = {
            var df = GraftTable.read(context.sparkSession, root, asOf)
            flt.flatMap(translate).foreach(c => df = df.where(c))
            df = if (req.isEmpty) df.select()
              else df.select(req.fieldNames.toSeq.map(col): _*)
            df.queryExecution.toRdd.asInstanceOf[RDD[Row]]
          }
        }.asInstanceOf[T]
      }
    }
  }

  /** Exact V1 Filter → Column translation; None = not fully expressible
    * (the filter then stays residual-only and never drops a row). */
  private def translate(f: V1Filter): Option[Column] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === lit(v))
    case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v) => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sources.In(a, vs) => Some(col(a).isin(vs.toSeq: _*))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case sources.StringContains(a, v) => Some(col(a).contains(v))
    case sources.And(l, r) =>
      for (lc <- translate(l); rc <- translate(r)) yield lc && rc
    case sources.Or(l, r) =>
      for (lc <- translate(l); rc <- translate(r)) yield lc || rc
    case sources.Not(c) => translate(c).map(!_)
    case sources.AlwaysTrue() => Some(lit(true))
    case sources.AlwaysFalse() => Some(lit(false))
    case _ => None
  }
}
