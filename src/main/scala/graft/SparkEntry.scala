package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every SURVEY.md §2 M-tier operator ships here as a named query with a
  * DuckDB oracle; X-tier operators ship as rows-only queries (no oracle)
  * plus unit/property tests under src/test.
  */
object SparkEntry {

  /** All query packs, one per SURVEY.md §2 category letter. */
  def packs: Seq[QueryPack] = Seq(
    Relational,   // §2.A scans + §2.B row transforms + §7.1 flagship
    Validation,   // §2.C checks
    Joins,        // §2.D joins incl. as-of + interval
    Aggregates,   // §2.E aggregation
    Windows,      // §2.F windows + §2.G sort/limit
    SetOps,       // §2.H set operations
    Scalars,      // §2.I scalar function surface
    TextOps,      // §2.J text analysis
    Similarity,   // §2.K dedup + similarity search
    Extensions,   // §2.M UDF/UDAF/Expression/Generator + §2.B7
    Sources,      // §2.A3/A4/A7/A8 + EP1 config pipeline
    Streaming,    // §2.L structured streaming (AvailableNow → batch check)
    MultimodalQ,  // NS multimodal binary columns + mapPartitions extract
    TextOps2,     // NS n-gram Jaccard, lang-ID, SimHash, SRP-LSH ANN
    Tpch,         // composite TPC-H join/agg shapes (Q3/Q5/Q6/Q10/Q14/Q18)
    Events)       // event analytics: sessionize, funnel, retention, paths

  private lazy val all: Seq[QueryDef] = {
    val ds = packs.flatMap(_.defs)
    val dup = ds.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    ds
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
