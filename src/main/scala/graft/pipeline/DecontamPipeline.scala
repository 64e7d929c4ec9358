package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-data assembly the decontam-split queries
  * exercise, as a reusable engine surface: bloom-gated benchmark
  * decontamination → near-dup closure over the survivors →
  * leakage-safe split (contaminated docs out first, then every
  * remaining dup cluster lands wholly in one split).
  *
  * Two pair tiers, routed:
  *   - [[Exact]]: the n-gram Jaccard shingle join — recall 1.0 over
  *     the informative shingles, but the composition's SOLE measured
  *     100× slope owner (`SCALING.md` decade attribution: pair stage
  *     4.7 s → 12.3 s → 109 s across sf0.1/1/10, 2.6× then 8.9× per
  *     decade; the whole composition 138.9 s at sf10).
  *   - [[Sig]]: the banded-MinHash signature join — measured 2.2×
  *     then 3.4× per decade at the pair stage (17.8 s at sf10, 6.1×
  *     under exact), 52.8 s composition at sf10. The scale path.
  *   - [[Auto]] (default): route by CLEAN-CORPUS SIZE — the count is
  *     read from the already-materialized clean-id frame, so the
  *     decision costs one bounded-frame count, never a corpus pass.
  *     Above [[AutoSigDocThreshold]] clean docs the exact tier's
  *     measured ceiling says signatures; at or below, exact recall
  *     is affordable. The routing decision is logged.
  *
  * [[AutoSigDocThreshold]] = 100k docs sits one decade under the
  * measured sf10 blowup (~500k docs → 109 s exact vs 17.8 s sig on
  * 32 cores) and one decade over where exact is still comfortably
  * interactive (~5k docs → ~4.7 s): at 100k the exact pair stage
  * already costs ~2.3× the sig stage and is on the 8.9×/decade
  * branch of its curve.
  *
  * Memory contract: the clean-id projection is materialized ONCE
  * (r16: the lazy plan re-ran the whole bloom gate — shingle + probe
  * over the corpus — per downstream consumer; 185 s vs ~90 s of
  * stage work at 100× data) via a localCheckpoint whose blocks only
  * a release handle can free (`Materialize.boundedReleasable`
  * contract). [[decontamDedupSplitReleasable]] returns that handle;
  * call it AFTER an action has materialized the returned split frame
  * (the severed blocks are unrecoverable — a released frame cannot
  * be recomputed). One-shot sessions can use [[decontamDedupSplit]]
  * and let session teardown (or a between-jobs persistent-RDD sweep)
  * reclaim the ~8 bytes/doc; a long-lived session invoking the
  * composition repeatedly MUST use the releasable form or blocks
  * accrue un-freeably.
  *
  * Reference scope: beyond-reference LLM-pipeline tier; stage
  * semantics are the oracle-gated `q_decontam_dedup_split` /
  * `q_decontam_dedup_split_sig` queries', verified against DuckDB
  * replays at sf0.01 and sf0.1.
  */
object DecontamPipeline {

  /** Near-dup pair tier for the closure stage. */
  sealed trait Tier
  /** Exact n-gram Jaccard pairs — recall 1.0, 8.9×/decade measured. */
  case object Exact extends Tier
  /** Banded-MinHash signature pairs — 3.4×/decade measured. */
  case object Sig extends Tier
  /** Route by clean-corpus size against [[AutoSigDocThreshold]]. */
  case object Auto extends Tier

  /** Clean-doc count above which [[Auto]] routes to [[Sig]] (see
    * class doc for the measured derivation). */
  val AutoSigDocThreshold = 100000L

  /** One-shot form of [[decontamDedupSplitReleasable]] — the
    * materialized clean-id blocks are left for session teardown. */
  def decontamDedupSplit(docs: DataFrame, idCol: String, textCol: String,
                         bench: DataFrame, bloomDir: String,
                         splits: Seq[(String, Double)],
                         salt: String = "split",
                         tier: Tier = Auto,
                         contamShingleN: Int = 8,
                         pairShingleN: Int = 3,
                         jaccardThreshold: Double = 0.5,
                         sigK: Int = 16, sigBands: Int = 8,
                         sigThreshold: Double = 0.4,
                         maxBucket: Int = 1000,
                         portable: Boolean = false,
                         autoSigThreshold: Long = AutoSigDocThreshold): DataFrame =
    decontamDedupSplitReleasable(docs, idCol, textCol, bench, bloomDir, splits,
      salt, tier, contamShingleN, pairShingleN, jaccardThreshold, sigK, sigBands,
      sigThreshold, maxBucket, portable, autoSigThreshold)._1

  /** The composition plus the clean-id release handle. `bloomDir` is
    * the at-rest benchmark shingle bloom
    * ([[graft.dedup.DedupOps.benchmarkShingleBloom]]) the gate
    * probes; `bench` is the same benchmark frame, joined exactly
    * against the bloom's surviving candidates. Output:
    * `(<idCol>, group_id, <split>)` — one row per clean doc.
    *
    * Release AFTER the returned frame is materialized (write or
    * collect); the pair-stage cache is consumed and released
    * internally (the connected-components build materializes it). */
  def decontamDedupSplitReleasable(
      docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, bloomDir: String,
      splits: Seq[(String, Double)],
      salt: String = "split",
      tier: Tier = Auto,
      contamShingleN: Int = 8,
      pairShingleN: Int = 3,
      jaccardThreshold: Double = 0.5,
      sigK: Int = 16, sigBands: Int = 8,
      sigThreshold: Double = 0.4,
      maxBucket: Int = 1000,
      portable: Boolean = false,
      autoSigThreshold: Long = AutoSigDocThreshold): (DataFrame, () => Unit) = {
    require(autoSigThreshold >= 0, s"autoSigThreshold=$autoSigThreshold must be >= 0")
    val (cleanIds, releaseIds) = graft.util.Materialize.boundedReleasable(
      cleanIdsPlan(docs, idCol, textCol, bench, bloomDir, contamShingleN))
    val clean = docs.join(cleanIds, Seq(idCol), "left_semi")
    val chosen = resolveTier(tier, cleanIds, autoSigThreshold)
    val (pairs, releasePairs) = chosen match {
      case Exact => graft.dedup.DedupOps.ngramJaccardPairsReleasable(
        clean, idCol, textCol, pairShingleN, jaccardThreshold, maxBucket)
      case Sig => graft.dedup.DedupOps.minhashNearDupPairsReleasable(
        clean, idCol, textCol, pairShingleN, sigK, sigBands, sigThreshold,
        portable, maxBucket)
      case Auto => throw new IllegalStateException("resolveTier returned Auto")
    }
    val cc = graft.graph.GraphOps.connectedComponents(pairs, "id_a", "id_b")
    releasePairs()   // the CC build materialized the pair pipeline
    val out = graft.training.TrainingOps.leakageSafeSplit(cleanIds, idCol, cc,
        splits, salt, portable)
      .select(col(idCol), col("group_id"), col("split"))
    (out, releaseIds)
  }

  /** The UN-checkpointed clean-id subtree — bloom-gated contamination
    * check → zero-hit filter → id projection. Factored so the
    * enforced plan gate can audit the PRE-checkpoint shape: the eager
    * checkpoint hides this subtree from the parent composition's
    * audited plan (its snapshot sees only the final split join), so
    * cartesian/BNLJ/exchange drift inside the gate subtree would
    * otherwise be invisible (registered as the
    * `q_decontam_clean_ids_pre` audit-only entry in
    * `SparkEntry.auditOnlyPlans`). */
  private[graft] def cleanIdsPlan(docs: DataFrame, idCol: String, textCol: String,
                                  bench: DataFrame, bloomDir: String,
                                  contamShingleN: Int = 8): DataFrame =
    graft.dedup.DedupOps.contaminationCheckViaBloom(docs, bench, bloomDir,
        idCol, textCol, contamShingleN)
      .where(col("n_contaminated") === 0).select(idCol)

  /** The [[Auto]] routing predicate, factored for direct spec
    * coverage: counts the (already-materialized, bounded) clean-id
    * frame and logs the decision with the measured rationale. */
  private[graft] def resolveTier(tier: Tier, cleanIds: DataFrame,
                                 autoSigThreshold: Long): Tier = tier match {
    case Auto =>
      val n = cleanIds.count()
      val t = if (n > autoSigThreshold) Sig else Exact
      System.err.println(s"[decontam] auto tier: $n clean docs vs threshold " +
        s"$autoSigThreshold -> $t (measured pair-stage slopes: exact 8.9x/decade, " +
        "sig 3.4x/decade; see DecontamPipeline scaladoc)")
      t
    case t => t
  }
}
