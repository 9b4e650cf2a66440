package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.functions.col

import graft.catalog.{GraftCatalog, GraftNamedTable}
import graft.tables.GraftTable

/** The DSv2 "graft" catalog: name-addressable graft_table — SQL DDL/DML,
  * saveAsTable, time travel, pushdown — all over the SAME log protocol
  * as the path API (VERDICT r19 task 1). */
class CatalogSpec extends SparkSpecBase {
  import spark.implicits._

  private val wh = "/tmp/graft_io/catalog_wh"

  private def resetWarehouse(): Unit = {
    val p = Paths.get(wh)
    if (Files.exists(p))
      scala.util.Using.resource(Files.walk(p))(
        _.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(Files.deleteIfExists(_)))
    Files.createDirectories(p)
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
  }

  test("SQL lifecycle: CREATE NAMESPACE / CREATE TABLE / INSERT INTO / " +
    "SELECT / ALTER / DROP all route through the graft catalog") {
    resetWarehouse()
    spark.sql("CREATE NAMESPACE graft.db")
    spark.sql("SHOW NAMESPACES IN graft").as[String]
      .collect() should contain("db")
    spark.sql("CREATE TABLE graft.db.t (k BIGINT, v DOUBLE, tag STRING) " +
      "PARTITIONED BY (tag)")
    // the table is a plain graft_table on disk — path API reads it too
    GraftTable.isTable(s"$wh/db/t") shouldBe true
    GraftTable.partitioning(s"$wh/db/t") shouldBe Seq("tag")
    spark.sql("INSERT INTO graft.db.t VALUES (1, 10.0, 'a'), (2, 20.0, 'b')")
    spark.sql("INSERT INTO graft.db.t VALUES (3, 30.0, 'a')")
    spark.sql("SELECT k, v, tag FROM graft.db.t ORDER BY k")
      .as[(Long, Double, String)].collect() shouldBe
      Array((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "a"))
    // aggregate over the named table
    spark.sql("SELECT tag, sum(v) AS s FROM graft.db.t GROUP BY tag " +
      "ORDER BY tag").as[(String, Double)].collect() shouldBe
      Array(("a", 40.0), ("b", 20.0))
    // INSERT OVERWRITE truncates then writes (one committed version)
    spark.sql("INSERT OVERWRITE graft.db.t VALUES (9, 90.0, 'z')")
    spark.sql("SELECT k FROM graft.db.t").as[Long].collect() shouldBe
      Array(9L)
    // ALTER TABLE property lands in the log
    spark.sql("ALTER TABLE graft.db.t SET TBLPROPERTIES " +
      "('changeDataFeed' = 'true')")
    GraftTable.tableProperties(s"$wh/db/t")("changeDataFeed") shouldBe "true"
    // SHOW TABLES sees it; DROP removes it
    spark.sql("SHOW TABLES IN graft.db").select("tableName")
      .as[String].collect() should contain("t")
    spark.sql("DROP TABLE graft.db.t")
    GraftTable.isTable(s"$wh/db/t") shouldBe false
    intercept[AnalysisException](spark.sql("SELECT * FROM graft.db.t"))
  }

  test("saveAsTable + time travel + path-API interop: DML through " +
    "GraftTable shows up under the name, VERSION AS OF replays") {
    resetWarehouse()
    spark.sql("CREATE NAMESPACE graft.db")
    Seq((1L, "x"), (2L, "y")).toDF("id", "s")
      .writeTo("graft.db.ct").create()                                // v1
    spark.table("graft.db.ct").orderBy($"id")
      .as[(Long, String)].collect() shouldBe Array((1L, "x"), (2L, "y"))
    // path-API DML against the SAME table, by construction of the layout
    val root = GraftCatalog.tablePath(spark, "db.ct")
    GraftTable.merge(spark, root,
      Seq((2L, "Y"), (3L, "z")).toDF("id", "s"), Seq("id"))           // v+1
    spark.table("graft.db.ct").orderBy($"id")
      .as[(Long, String)].collect() shouldBe
      Array((1L, "x"), (2L, "Y"), (3L, "z"))
    // time travel through SQL reads the pre-merge version
    val v1 = GraftTable.latestVersion(root).get - 1
    spark.sql(s"SELECT id, s FROM graft.db.ct VERSION AS OF $v1")
      .orderBy($"id").as[(Long, String)].collect() shouldBe
      Array((1L, "x"), (2L, "y"))
    // append via DataFrameWriterV2
    Seq((4L, "w")).toDF("id", "s").writeTo("graft.db.ct").append()
    spark.table("graft.db.ct").count() shouldBe 4L
    // writes to a time-travel read fail loud
    intercept[Exception] {
      spark.sql(s"INSERT INTO graft.db.ct VERSION AS OF $v1 VALUES (9,'q')")
    }
  }

  test("catalog scans prune files from pushed filters and prune columns " +
    "(the V1Scan compiles onto the GraftFileIndex plan)") {
    resetWarehouse()
    spark.sql("CREATE NAMESPACE graft.db")
    // two well-separated ranges so min/max skipping is decisive; two
    // appends → at least two files
    spark.sql("CREATE TABLE graft.db.r (k BIGINT, v DOUBLE)")
    (1L to 1000L).map(i => (i, i * 1.0)).toDF("k", "v")
      .writeTo("graft.db.r").append()
    (100001L to 101000L).map(i => (i, i * 1.0)).toDF("k", "v")
      .writeTo("graft.db.r").append()
    val root = GraftCatalog.tablePath(spark, "db.r")
    GraftTable.snapshot(root).files.size should be >= 2
    val q = spark.sql(
      "SELECT v FROM graft.db.r WHERE k BETWEEN 100500 AND 100510")
    q.as[Double].collect().sorted shouldBe
      (100500L to 100510L).map(_.toDouble).toArray
    // pushed filters visible in the formatted plan, and the inner file
    // index pruned the low-range file(s)
    val plan = q.queryExecution.executedPlan.toString
    plan should include("PushedFilters")
    val idx = GraftTable.lastReadIndex.get
    idx.lastPrune.get._1 should be < idx.lastPrune.get._2
    // count(*) over the name: empty required schema still scans sanely
    spark.sql("SELECT count(*) AS n FROM graft.db.r").as[Long]
      .head() shouldBe 2000L
  }

  test("readStream.table(graft.db.tbl): commit-version offsets, " +
    "exactly-once resume via the checkpoint, enriched feeds stay on " +
    "the path source") {
    import org.apache.spark.sql.streaming.Trigger
    resetWarehouse()
    spark.sql("CREATE NAMESPACE graft.db")
    spark.sql("CREATE TABLE graft.db.st (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.db.st VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft.db.st VALUES (3, 'c')")
    val scratch = "/tmp/graft_io/catalog_stream"
    graft.streaming.StreamOps.rmrf(scratch)
    def drain(): Unit = {
      val q = spark.readStream.table("graft.db.st")
        .writeStream
        .option("checkpointLocation", s"$scratch/cp")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          b.write.mode("overwrite").parquet(s"$scratch/out/b${System.nanoTime}")
          ()
        }
        .start()
      q.awaitTermination()
    }
    drain()
    def outRows() = {
      val dirs = scala.util.Using.resource(
        Files.list(Paths.get(s"$scratch/out")))(
        _.iterator().asScala.map(_.toString).toSeq.sorted)
      spark.read.parquet(dirs: _*).select($"k").as[Long].collect().sorted
    }
    outRows() shouldBe Array(1L, 2L, 3L)
    // resume: only the NEW commit delivers
    spark.sql("INSERT INTO graft.db.st VALUES (4, 'd')")
    drain()
    outRows() shouldBe Array(1L, 2L, 3L, 4L)
    // the enriched change feed stays on the path source by contract
    intercept[Exception] {
      spark.readStream.option("withImages", "true").table("graft.db.st")
        .writeStream.option("checkpointLocation", s"$scratch/cp2")
        .trigger(Trigger.AvailableNow()).format("noop")
        .start().awaitTermination()
    }
  }

  test("catalog edge contracts: duplicate create fails, drop is " +
    "idempotent-false, rename moves, column rename/drop ride ALTER, " +
    "tablePath validates input") {
    resetWarehouse()
    spark.sql("CREATE NAMESPACE graft.db")
    spark.sql("CREATE TABLE graft.db.e (a BIGINT, b STRING)")
    intercept[AnalysisException](
      spark.sql("CREATE TABLE graft.db.e (a BIGINT)"))
    spark.sql("INSERT INTO graft.db.e VALUES (1, 'one')")
    // ALTER ... RENAME COLUMN maps to the log's column-mapping rename
    spark.sql("ALTER TABLE graft.db.e RENAME COLUMN b TO label")
    spark.sql("SELECT label FROM graft.db.e").as[String]
      .collect() shouldBe Array("one")
    spark.sql("ALTER TABLE graft.db.e DROP COLUMN label")
    spark.table("graft.db.e").columns shouldBe Array("a")
    // RENAME TABLE is a directory move — log and data come along
    // the RENAME target resolves inside the source's catalog — naming
    // the catalog again would read as namespace ["graft","db"]
    spark.sql("ALTER TABLE graft.db.e RENAME TO db.e2")
    spark.sql("SELECT a FROM graft.db.e2").as[Long].collect() shouldBe
      Array(1L)
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    cat.tableExists(Identifier.of(Array("db"), "e")) shouldBe false
    cat.dropTable(Identifier.of(Array("db"), "e")) shouldBe false
    // non-cascade namespace drop refuses while tables remain
    intercept[Exception](spark.sql("DROP NAMESPACE graft.db"))
    spark.sql("DROP NAMESPACE graft.db CASCADE")
    cat.namespaceExists(Array("db")) shouldBe false
    intercept[IllegalArgumentException](
      GraftCatalog.tablePath(spark, "db..t"))
    // path syntax in a name part must not escape the warehouse
    intercept[IllegalArgumentException](
      GraftCatalog.tablePath(spark, "db.../../etc/x"))
    intercept[IllegalArgumentException](
      GraftCatalog.tablePath(spark, "/etc.x"))
    intercept[IllegalArgumentException](
      GraftCatalog.tablePath(spark, "db.a/b"))
  }

  test("root namespace: a table created without a namespace is listable " +
    "via SHOW TABLES against the catalog default, and the root namespace " +
    "exists but is not droppable") {
    resetWarehouse()
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    cat.namespaceExists(Array.empty) shouldBe true
    spark.sql("CREATE TABLE graft.rootless (a BIGINT)")
    cat.listTables(Array.empty).map(_.name) should contain("rootless")
    spark.sql("SHOW TABLES IN graft").select("tableName")
      .as[String].collect() should contain("rootless")
    intercept[IllegalArgumentException](
      cat.dropNamespace(Array.empty, cascade = true))
    spark.sql("DROP TABLE graft.rootless")
  }
}
