package graft

import org.apache.spark.sql.SparkSession

/** Perf protocol (SURVEY §6): run every registered query on
  * SPARK_GRAFT_SF_DIR (default sf0.1), force full execution through the
  * noop sink (real compute, no output IO — count() would let column
  * pruning skip most of the work), print ONE JSON line.
  *
  * local[32] / shuffle.partitions=32 mirrors the driver's grading
  * environment; AQE stays on (coalesces the 32 shuffle partitions where
  * the data is small — the same mechanism that right-sizes at 100 TB).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def force(name: String): Double = {
      val t0 = System.nanoTime()
      val dt =
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
      // drop every cache/checkpoint the query pinned: between independent
      // queries nothing is live by construction, and unreleased storage
      // taxes every later query (the round-6/7 finding — post-clustering
      // queries regressed 2-15x from dead blocks squeezing exec memory)
      graft.core.Checkpoints.releaseAll(spark)
      dt
    }

    // Run ONE query in a freshly forked JVM — same classpath, module
    // flags and heap as this one — and return its per-query seconds
    // (parsed from the child's own bench line; JVM/session startup and
    // its warmup pass are excluded by construction). Isolation cuts both
    // ways: a heavy query stops paying for the session's accumulated GC
    // pressure / codegen cache / storage fragmentation, and stops taxing
    // every query after it. SPARK_GRAFT_FORK_HEAVY names the queries to
    // isolate (exact name or short prefix, comma-separated) — comparing a
    // query's forked vs in-session seconds is the direct measurement of
    // cross-query contamination (BASELINE.md records the k12b pair).
    def forked(name: String): Double = {
      import scala.jdk.CollectionConverters._
      val javaBin = java.nio.file.Paths.get(
        sys.props("java.home"), "bin", "java").toString
      // inherit the parent's JVM args verbatim: the --add-opens set Spark
      // needs on JDK 17+ and the -Xmx both live there
      val jvmArgs = java.lang.management.ManagementFactory
        .getRuntimeMXBean.getInputArguments.asScala.toSeq
      val pb = new ProcessBuilder(
        (Seq(javaBin) ++ jvmArgs ++
          Seq("-cp", sys.props("java.class.path"), "graft.Bench")).asJava)
      pb.environment().put("SPARK_GRAFT_ONLY", name)
      pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
      pb.environment().remove("SPARK_GRAFT_FORK_HEAVY") // child never re-forks
      // child stderr (failure notes, [graft-cc] attribution) stays visible
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val p = pb.start()
      val out = scala.io.Source.fromInputStream(p.getInputStream).getLines().toList
      val rc = p.waitFor()
      val re = ("\"" + java.util.regex.Pattern.quote(name) +
        "\":(-?[0-9][0-9.eE+-]*)").r
      val secs = out.reverseIterator
        .flatMap(l => re.findFirstMatchIn(l).map(_.group(1).toDouble))
        .nextOption().getOrElse(-1.0)
      if (rc != 0 || secs < 0)
        System.err.println(s"[bench] forked $name: exit=$rc, parsed=$secs")
      secs
    }

    // one small warmup pass to JIT codegen paths before timing
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    graft.core.Checkpoints.releaseAll(spark) // warmup leaves no storage behind

    // SPARK_GRAFT_ONLY=q1,q2 limits the run (local iteration aid).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { o => // a typo would otherwise silently run everything
      val unknown = o -- SparkEntry.queries.keySet
      if (unknown.nonEmpty)
        System.err.println(s"[bench] unknown SPARK_GRAFT_ONLY names: ${unknown.toSeq.sorted.mkString(",")}")
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // SPARK_GRAFT_FORK_HEAVY=k12b,... — run the named queries (exact name
    // or prefix, e.g. "k12b" for k12b_lsh_neardup_clusters) each in a
    // fresh JVM; everything else runs in-session as usual
    val forkSpecs = sys.env.get("SPARK_GRAFT_FORK_HEAVY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)
    forkSpecs.filterNot(f => names.exists(n => n == f || n.startsWith(f + "_")))
      .foreach(f => System.err.println(s"[bench] SPARK_GRAFT_FORK_HEAVY '$f' matches no query"))
    def isForked(n: String) = forkSpecs.exists(f => n == f || n.startsWith(f + "_"))
    val results = names.map(n => n -> (if (isForked(n)) forked(n) else force(n)))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    // the per-query line above can exceed the driver's tail-capture window
    // (BENCH_r07 preserved 65/132 queries and lost the head-positioned
    // total) — repeat the headline number in a short LAST line so the
    // total always survives truncation
    println(s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},"failed":${results.count(_._2 < 0)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
