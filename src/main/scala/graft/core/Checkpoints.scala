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

  /** Eagerly localCheckpoint `df` — materialize it and cut lineage. */
  def eager(df: DataFrame): DataFrame = df.localCheckpoint(true)

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
