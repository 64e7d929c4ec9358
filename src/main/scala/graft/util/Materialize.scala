package graft.util

import org.apache.spark.sql.DataFrame

/** Plan-surgery helper for BOUNDED intermediate frames that feed
  * multiple downstream branches (a totals aggregate plus the main
  * path is the recurring shape): Catalyst expands each reference into
  * its own copy of the subtree, and exchange reuse does not reliably
  * collapse near-identical-but-not-canonical aggregates (verified via
  * `.explain("formatted")` on the drift gauges — the corpus scan
  * appeared once per branch). Severing the lineage with a checkpoint
  * makes every branch read the materialized bounded frame, so the
  * corpus work runs exactly once however many branches follow.
  *
  * Reliable checkpoint when a dir is configured; local checkpoint
  * otherwise (fine on local[*] — a cluster run that can lose
  * executors should set a checkpoint dir). Only call on frames that
  * are bounded BY CONSTRUCTION (sketches, vocab counts, per-day
  * bucket rows) — this materializes eagerly.
  */
object Materialize {
  def bounded(df: DataFrame): DataFrame = boundedReleasable(df)._1

  /** [[bounded]] plus a release handle that frees the materialized
    * blocks EXPLICITLY. A local checkpoint's RDD is persisted in the
    * BlockManager but never enters the CacheManager, so neither
    * `Dataset.unpersist` nor a CacheManager sweep can free it — only
    * the handle to the underlying checkpoint RDD can (ContextCleaner
    * frees it eventually on GC, too late for a tight streaming loop).
    * Long-lived callers that materialize per refresh (the group-index
    * stream) release by handle so blocks can't accumulate — and,
    * critically, WITHOUT sweeping `getPersistentRDDs`, which would
    * also unpersist blocks a CONCURRENT job in the same session
    * persisted (a severed localCheckpoint block is unrecoverable).
    * Release is a no-op for the reliable-checkpoint path (files,
    * owned by the checkpoint dir lifecycle).
    */
  def boundedReleasable(df: DataFrame): (DataFrame, () => Unit) =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      (df.checkpoint(), () => ())
    else {
      val out = df.localCheckpoint()
      val release: () => Unit = out.queryExecution.analyzed match {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          () => { l.rdd.unpersist(blocking = false); () }
        case _ => () => () // plan shape drifted: fall back to ContextCleaner
      }
      (out, release)
    }
}
