package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** AT-REST membership-prune artifact — "have we EVER seen this key",
  * answered without scanning history: the k bit POSITIONS of a
  * classic Bloom filter stored as plain rows (`pos BIGINT`), one
  * tagged tranche per ingest. Two properties make this the cheapest
  * member of the artifact tier:
  *
  *   - **Idempotent merge, no protocol.** The filter is a SET of bit
  *     positions; union is OR, OR is idempotent — the HLL stance:
  *     replayed tranches, crashed consolidations, double-delivered
  *     epochs all converge by algebra, with none of the sum family's
  *     superseding-manifest machinery. [[consolidateBloom]] is a
  *     plain distinct-rewrite; a crash that leaves both the folded
  *     tranche and its inputs visible changes nothing.
  *   - **Bounded forever.** The artifact can never exceed `mBits`
  *     rows however much history flows through it (positions
  *     saturate, they don't accumulate) — a year of ingest reads the
  *     same ≤m-row frame as day one. Saturation shows up as a rising
  *     false-possible rate, measured by [[bloomIndexStats]]'s fill
  *     fraction, not as silent wrongness: absent keys are DEFINITELY
  *     new (no false negatives ever).
  *
  * Probe semantics ([[pruneAgainstBloomIndex]]): a batch row is
  * "possibly seen" iff ALL k of its positions are present; the
  * operator keeps the PROVABLY-NEW rows (the incremental-ingest gate:
  * "which of today's keys has history never touched"), dropping
  * possibly-seen rows at the classic (1−e^{−kn/m})^k false-drop rate.
  * Exactness-critical callers follow with the exact check on the
  * (small) possibly-seen remainder — the [[RelationalOps
  * .bloomPrefilteredJoin]] discipline, here across RUNS instead of
  * within one.
  *
  * Hashing: `portable = true` routes through the md5 tier so an
  * oracle replays every position; default xxhash64. The `(mBits, k,
  * portable)` triple is FROZEN in a `_graft_bloom_meta` file at birth
  * — positions from mismatched parameters would silently never match,
  * so appends and probes validate against the stored triple and fail
  * fast on drift (the BM25 `nbuckets` contract).
  *
  * 100 TB shape: the probe joins the batch against the ≤m-row
  * position set k times on the position key — AQE broadcasts the set
  * at practical m (2^20 positions ≈ 8 MB); history itself is never
  * read. Writes are one distinct over k·|batch| positions.
  */
object BloomIndex {

  private val MetaName = "_graft_bloom_meta"

  private def metaPath(dir: String) = new org.apache.hadoop.fs.Path(dir, MetaName)

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeMeta(spark: SparkSession, dir: String,
                        mBits: Long, k: Int, portable: Boolean): Unit = {
    val out = fs(spark, dir).create(metaPath(dir), true)
    try out.write(s"$mBits $k $portable".getBytes("UTF-8")) finally out.close()
  }

  private def readMeta(spark: SparkSession, dir: String): (Long, Int, Boolean) = {
    val f = fs(spark, dir)
    require(f.exists(metaPath(dir)),
      s"BloomIndex: no $MetaName under $dir — not a bloom index (build with writeBloomTranche)")
    val in = f.open(metaPath(dir))
    val parts =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.split(" ")
      finally in.close()
    (parts(0).toLong, parts(1).toInt, parts(2).toBoolean)
  }

  /** The k position columns for a key — seeded hash family, each
    * reduced mod mBits. Both tiers yield non-negative hashes into
    * non-negative positions (`pmod`), so `%` replays in any engine. */
  private def positionCols(key: Column, mBits: Long, k: Int,
                           portable: Boolean): Seq[Column] =
    (0 until k).map { i =>
      val h =
        if (portable) graft.functions.Hashes.portable(
          concat(lit(s"bf$i|"), key.cast(StringType)))
        else xxhash64(lit(s"bf$i"), key)
      pmod(h, lit(mBits)).cast(LongType)
    }

  /** One ingest = one position tranche (distinct positions of the
    * batch's non-null keys). First write births the index and freezes
    * `(mBits, k, portable)`; appends validate the frozen triple. */
  def writeBloomTranche(df: DataFrame, keyCol: String, dir: String, tag: String,
                        mBits: Long = 1L << 20, k: Int = 3,
                        portable: Boolean = false): Unit = {
    require(mBits >= 64, s"writeBloomTranche: mBits=$mBits too small")
    require(k >= 1 && k <= 8, s"writeBloomTranche: k=$k not in [1,8]")
    val spark = df.sparkSession
    val exists = fs(spark, dir).exists(metaPath(dir))
    if (exists) {
      val (m0, k0, p0) = readMeta(spark, dir)
      require((m0, k0, p0) == ((mBits, k, portable)),
        s"writeBloomTranche: params ($mBits,$k,$portable) != frozen ($m0,$k0,$p0)")
    }
    val key = col(keyCol)
    df.where(key.isNotNull)
      .select(explode(array(positionCols(key, mBits, k, portable): _*)).as("pos"))
      .distinct()
      .write.mode("overwrite").parquet(s"$dir/batch=$tag")
    if (!exists) writeMeta(spark, dir, mBits, k, portable)
  }

  /** The merged position set (≤ mBits rows however many tranches). */
  def readBloomPositions(spark: SparkSession, dir: String): DataFrame = {
    readMeta(spark, dir) // fail fast on a non-index dir
    spark.read.parquet(dir).select(col("pos")).distinct()
  }

  /** Keep the PROVABLY-NEW rows of `batch`: those with at least one
    * position absent from the index — keys history has definitely
    * never written (no false negatives; possibly-seen rows drop at
    * the bloom false-positive rate). NULL keys are kept: the index
    * can assert nothing about them. */
  def pruneAgainstBloomIndex(batch: DataFrame, dir: String,
                             keyCol: String): DataFrame = {
    val (joined, anyMiss, cleanup) = flagAgainst(batch, dir, keyCol)
    joined.where(col(keyCol).isNull || anyMiss).drop(cleanup: _*)
  }

  /** The complement gate: keep the POSSIBLY-SEEN rows (all k
    * positions present) — the CANDIDATE set for an exact downstream
    * check; false positives only cost exact-check work, never a wrong
    * row, and nothing seen can be missing. NULL keys drop (nothing
    * assertable). */
  def possiblySeenAgainstBloomIndex(batch: DataFrame, dir: String,
                                    keyCol: String): DataFrame = {
    val (joined, anyMiss, cleanup) = flagAgainst(batch, dir, keyCol)
    joined.where(col(keyCol).isNotNull && !anyMiss).drop(cleanup: _*)
  }

  // one left join per hash against the same ≤m-row set (AQE
  // broadcasts it); `anyMiss` = some position absent
  private def flagAgainst(batch: DataFrame, dir: String, keyCol: String)
  : (DataFrame, Column, Seq[String]) = {
    val spark = batch.sparkSession
    val (mBits, k, portable) = readMeta(spark, dir)
    val posSet = readBloomPositions(spark, dir)
    val ps = positionCols(col(keyCol), mBits, k, portable)
    val joined = ps.zipWithIndex.foldLeft(batch) { case (acc, (p, i)) =>
      acc.join(posSet.select(col("pos").as(s"__bf$i")),
        p === col(s"__bf$i"), "left")
    }
    val anyMiss = (0 until k).map(i => col(s"__bf$i").isNull).reduce(_ || _)
    (joined, anyMiss, (0 until k).map(i => s"__bf$i"))
  }

  /** The index's `batch=` tranche directories — the read-side fan-in
    * [[maybeConsolidateBloom]] bounds. */
  private def tranchePaths(spark: SparkSession, dir: String)
  : Seq[org.apache.hadoop.fs.Path] = {
    val f = fs(spark, dir)
    val root = new org.apache.hadoop.fs.Path(dir)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("batch=")).sortBy(_.getName).toSeq
  }

  /** AUTO-consolidation tick (the [[graft.util.SumTranches
    * .maybeConsolidate]] contract under the cheaper OR algebra): fold
    * only when the tranche count EXCEEDS `maxLive`, so every tick
    * boundary leaves either ≤ maxLive untouched tranches or exactly
    * ONE — an unattended ingest loop's probe fan-in stays bounded
    * without an operator remembering to consolidate, and quiet
    * periods pay nothing. Idempotence makes the tick safe to run at
    * ANY moment (even racing a crash replay — see
    * [[consolidateBloom]]). Returns whether a fold ran. */
  def maybeConsolidateBloom(spark: SparkSession, dir: String,
                            maxLive: Int): Boolean = {
    require(maxLive >= 1, s"maybeConsolidateBloom: maxLive=$maxLive must be >= 1")
    if (tranchePaths(spark, dir).length > maxLive) {
      consolidateBloom(spark, dir); true
    } else false
  }

  /** Fold the tranches to one — a PLAIN distinct rewrite: under OR
    * algebra a crash that leaves both the folded tranche and its
    * inputs visible double-counts nothing, so no superseding manifest
    * is needed (delete-after-write suffices; a replay re-folds). */
  def consolidateBloom(spark: SparkSession, dir: String): Unit = {
    val f = fs(spark, dir)
    val tranches = tranchePaths(spark, dir)
    if (tranches.length <= 1) return
    val tag = "consolidated-" + java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(tranches.map(_.getName).mkString("\n")))
    readBloomPositions(spark, dir)
      .write.mode("overwrite").parquet(s"$dir/batch=$tag")
    tranches.filterNot(_.getName == s"batch=$tag")
      .foreach(t => f.delete(t, true))
  }

  /** TRIAGE gauge in the cross-family dashboard schema
    * ([[graft.meta.IndexDashboard.indexHealthAll]]): one row
    * `(artifact, n_tranches, n_marked, n_unproven, count_fresh)` from
    * directory metadata only — no data file opened. `n_unproven` is 0
    * BY ALGEBRA, not by protocol: every visible tranche is valid under
    * idempotent OR (a crash remnant's positions merge away), so there
    * is no crash-remnant state to page on — the pager dial for this
    * family is [[bloomIndexStats]]' fill fraction, which needs a data
    * scan and so stays a separate gauge. */
  def bloomIndexHealth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    readMeta(spark, dir) // fail fast on a non-index dir
    val tranches = tranchePaths(spark, dir)
    val marked = fs(spark, dir).globStatus(
      new org.apache.hadoop.fs.Path(dir, "batch=*/_SUCCESS"))
      .map(_.getPath.getParent.getName).toSet
    Seq(("pos", tranches.length, tranches.count(t => marked(t.getName)),
      0, Option.empty[Boolean]))
      .toDF("artifact", "n_tranches", "n_marked", "n_unproven", "count_fresh")
  }

  /** Content gauge: `(m_bits, k, n_positions, fill_fraction)` — the
    * saturation dial (false-possible rate ≈ fill^k); one scan of the
    * ≤m-row artifact. */
  def bloomIndexStats(spark: SparkSession, dir: String): DataFrame = {
    val (mBits, k, _) = readMeta(spark, dir)
    readBloomPositions(spark, dir)
      .agg(count(lit(1)).as("n_positions"))
      .select(lit(mBits).as("m_bits"), lit(k).as("k"), col("n_positions"),
        (col("n_positions").cast(org.apache.spark.sql.types.DoubleType)
          / lit(mBits.toDouble)).as("fill_fraction"))
  }
}
