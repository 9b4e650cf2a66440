package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev utility: dump `.explain("formatted")` for the NAMED queries to
  * one file per query — the before/after plan evidence the optimization
  * rounds commit under `plans/rNN/`. Unlike [[Plans]] (one markdown over
  * a fixed headline list), this takes the exact query set being touched:
  *
  *   runMain graft.PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]
  *
  * writes `<outDir>/<query>_<suffix>.txt`. The session mirrors Bench's
  * (local[$SPARK_GRAFT_CPUS], shuffle.partitions=cpus, UTC) so the plans
  * are the benched plans. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: runMain graft.PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(outDir)
    names.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      val f = outDir.resolve(s"${name}_$suffix.txt")
      Files.writeString(f, plan)
      println(s"wrote $f")
    }
    spark.stop()
  }
}
