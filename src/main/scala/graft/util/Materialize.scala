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
  def bounded(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
