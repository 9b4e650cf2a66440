package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print a named SparkEntry query (or a verify-output
  * parquet) for eyeballing. Usage:
  *   runMain graft.Show <queryName> [sfDir]
  *   runMain graft.Show --parquet <path>
  */
object Show {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args match {
      case Array("--parquet", path) =>
        val df = spark.read.parquet(path)
        df.printSchema()
        df.show(50, truncate = false)
      case Array(name) =>
        SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").show(50, truncate = false)
      case Array(name, sfDir) =>
        SparkEntry.queries(name)(spark, sfDir).show(50, truncate = false)
      case _ =>
        System.err.println(s"queries: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    }
    spark.stop()
  }
}
