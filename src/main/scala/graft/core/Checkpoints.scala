package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle control for eagerly-checkpointed intermediates.
  *
  * `Dataset.localCheckpoint(eager = true)` materializes the frame into the
  * block manager and truncates its lineage — the right tool for reused or
  * iterated intermediates — but the storage it pins is NEVER released by
  * `Dataset.unpersist()` (that only touches the CacheManager). Left alone,
  * every checkpoint lives until its RDD is garbage-collected and the
  * ContextCleaner notices, which in a long session means the storage
  * fraction fills with dead blocks and squeezes execution memory (measured
  * in round 6: every bench query running after the clustering queries
  * regressed 2–5× from exactly this). At cluster scale the same leak is an
  * OOM, not a slowdown.
  *
  * The contract here: builders checkpoint big intermediates, materialize
  * their (small) result, then `release` the intermediates explicitly.
  * Release is only safe once every consumer has materialized — a
  * localCheckpoint has no lineage to recompute from, so unpersisting a
  * frame that something still needs is a job failure, not a slowdown.
  */
object Checkpoints {

  /** Eagerly checkpoint `df` — materialize it and cut lineage.
    *
    * Two modes, picked per-session by `SPARK_GRAFT_CHECKPOINT_DIR`:
    *  - unset (default, right for local[*]): `localCheckpoint` — blocks
    *    live in executor storage, zero extra IO, but any executor loss
    *    destroys them with no lineage to recompute from. On a single-JVM
    *    deployment there is nothing to lose an executor to, so this is
    *    strictly faster.
    *  - set to a cluster-visible path (HDFS/object store): reliable
    *    `checkpoint()` — blocks are written to the shared FS, so the
    *    iterative loops (connectedComponents, lshClusters) survive
    *    executor churn. This is the 100 TB posture: a 20-round CC loop on
    *    a 1000-executor cluster WILL see preemptions, and a
    *    localCheckpoint-based loop dies on the first one.
    * The checkpoint dir is installed once (idempotent set per session);
    * both modes return a plan whose root is a LogicalRDD, so `release`
    * and the retained-memory contracts work identically. */
  def eager(df: DataFrame): DataFrame = checkpointDir match {
    case Some(dir) =>
      val sc = df.sparkSession.sparkContext
      // setCheckpointDir creates a unique subdir per call — only install
      // when unset or pointed elsewhere, so one session reuses one root
      if (!sc.getCheckpointDir.exists(_.contains(dir))) sc.setCheckpointDir(dir)
      df.checkpoint(true)
    case None => df.localCheckpoint(true)
  }

  /** The reliable-checkpoint root, if configured. The env var is the
    * deployment surface; the system property exists because a ScalaTest
    * JVM cannot set its own environment (HardeningSpec uses it to run the
    * clustering loop in reliable mode). */
  private def checkpointDir: Option[String] =
    sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR")
      .orElse(sys.props.get("graft.checkpoint.dir"))
      .filter(_.nonEmpty)

  /** Release the block-manager storage behind an eagerly-checkpointed
    * frame. Safe only after every consumer of `df` has materialized
    * (the checkpoint's lineage is truncated — the data cannot be
    * recomputed). Blocking=false: the block drop proceeds async, the
    * driver doesn't wait.
    *
    * Accepts ONLY frames whose plan root is itself the checkpoint
    * (i.e. the exact frame `eager`/`localCheckpoint` returned) and
    * no-ops otherwise. A plan-walking variant that unpersisted every
    * LogicalRDD found anywhere in a derived plan would invite disaster:
    * called on a frame that merely EMBEDS a shared checkpoint, it would
    * drop storage other live consumers still need — and with no lineage
    * to recompute from, that is a job failure, not a slowdown. Callers
    * therefore keep a handle to the checkpoint itself and pass that. */
  def release(dfs: DataFrame*): Unit =
    dfs.foreach { df =>
      df.queryExecution.analyzed match {
        case lr: LogicalRDD => lr.rdd.unpersist(false)
        case _ => () // derived or non-checkpoint frame — refuse to guess
      }
    }

  /** Materialize `result` (eager checkpoint), then release the given
    * intermediates — the standard exit move for a builder whose output is
    * small (id pairs, labels) but whose scaffolding is not (band
    * explosions, token sets). Returns the checkpointed result, which the
    * caller owns: release it in turn once its consumers have run, or let
    * per-query cleanup (Bench/Verify) collect it. */
  def materializeThenRelease(result: DataFrame, intermediates: DataFrame*): DataFrame = {
    val cp = eager(result)
    release(intermediates: _*)
    cp
  }

  /** Drop every persisted RDD in the session — cache(), persist() and
    * localCheckpoint() storage alike. For harness use between independent
    * queries (Bench/Verify), where by construction nothing is live. */
  def releaseAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }
}
