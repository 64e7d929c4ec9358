package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared at-rest machinery for SUM-algebra artifacts — keyed count
  * frames whose tranches merge by adding counts per key (histogram
  * sketches, co-occurrence pair counts, item margins). The layout is
  * the tagged-tranche one every index family here uses
  * (`dir/batch=<tag>`, ingest overwrites its OWN tranche so replays
  * converge), but sum changes the crash story relative to the HLL
  * register-max artifact: max is idempotent, so consolidation there
  * needs no protocol; SUM double-counts if a half-finished
  * consolidation leaves both the folded output and its inputs visible.
  * Hence the SUPERSEDING MANIFEST: a consolidated tranche carries a
  * `_graft_folded.txt` naming every tranche it absorbed, and readers
  * exclude those names — so the consolidate sequence (write scratch →
  * write manifest → rename into place → delete inputs) is crash-safe
  * at every boundary. Underscore-prefixed files are invisible to
  * Spark's parquet listing, so the manifest rides inside the tranche
  * directory itself and can never be separated from it.
  */
object SumTranches {

  private val ManifestName = "_graft_folded.txt"

  /** One ingest = one tranche, overwriting its own tag (replay-safe).
    * Mode-transparent: a pointer-committed artifact resolves to its
    * current generation and the tranche lands inside it (the dedup
    * append stance — generations are immutable only across
    * consolidation swaps). `commit = PointerCommit` on a NOT-YET-BORN
    * artifact births it through the manifest protocol; every later
    * write may omit the parameter (resolution is automatic). */
  def write(counts: DataFrame, dir: String, tag: String,
            commit: graft.merge.Merge.Commit =
              graft.merge.Merge.RenameCommit): Unit = {
    val spark = counts.sparkSession
    val resolved = graft.merge.Merge.resolveDir(spark, dir)
    if (commit == graft.merge.Merge.PointerCommit && resolved == dir) {
      require(live(spark, dir).isEmpty,
        s"SumTranches.write: $dir already holds rename-committed tranches; " +
          "one commit mode per directory (fold + rebuild to convert)")
      graft.merge.Merge.swapWith(spark, dir, commit)(gen =>
        counts.write.mode("overwrite").parquet(s"$gen/batch=$tag"))
    } else
      counts.write.mode("overwrite").parquet(s"$resolved/batch=$tag")
  }

  /** Tranches a reader should count: every `batch=*` minus any named
    * in a surviving consolidated tranche's manifest. A
    * pointer-committed artifact resolves through its `_current`
    * manifest first — every reader below is mode-transparent. */
  def live(spark: SparkSession, dir0: String): Seq[org.apache.hadoop.fs.Path] = {
    val dir = graft.merge.Merge.resolveDir(spark, dir0)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val tranches = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("batch=")).sortBy(_.getName).toSeq
    val superseded: Set[String] =
      tranches.flatMap(t => manifestNames(fs, t)).toSet
    tranches.filterNot(t => superseded(t.getName))
  }

  /** Names a tranche's superseding manifest carries (empty when none). */
  private def manifestNames(fs: org.apache.hadoop.fs.FileSystem,
                            tranche: org.apache.hadoop.fs.Path): Seq[String] = {
    val mf = new org.apache.hadoop.fs.Path(tranche, ManifestName)
    if (!fs.exists(mf)) Nil
    else {
      val in = fs.open(mf)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toList
      finally in.close()
    }
  }

  /** The superseding set a fold's output must carry: the folded
    * tranches' own names PLUS everything THEY had absorbed (transitive
    * — r14 ADVICE #1: a chain of folds otherwise forgets first-fold
    * input names, and a replayed ingest of such a tag would land live
    * and double-count), minus the output's own name (a manifest naming
    * its own tranche would self-exclude it from live()).
    *
    * GROWTH CONTRACT (r15 self-review): the manifest accumulates one
    * line per DISTINCT ingest tag ever absorbed, forever — by design,
    * because replay protection for a tag can only be dropped when no
    * replayer can resend it, a fact the artifact cannot observe. The
    * bound is therefore the artifact's lifetime ingest-tag count: at
    * one tranche/hour for a decade that is ~88k lines ≈ a few MB read
    * once per live()/fold — negligible next to the data scan. If an
    * operator retires a tag universe (e.g. rotates the upstream
    * pipeline id), deleting the artifact directory and re-folding from
    * source is the sanctioned reset; truncating the manifest in place
    * is NOT (it silently re-arms double-count for every dropped tag). */
  private def transitiveFolded(fs: org.apache.hadoop.fs.FileSystem,
                               folded: Seq[org.apache.hadoop.fs.Path],
                               outName: String): Seq[String] =
    (folded.map(_.getName) ++ folded.flatMap(t => manifestNames(fs, t)))
      .distinct.filterNot(_ == outName).sorted

  /** Merge-on-read: one scan over the live tranches, key-wise sum —
    * bounded by Σ tranche sizes, never a corpus. */
  def read(spark: SparkSession, dir: String,
           keyCols: Seq[String], cntCol: String): DataFrame =
    readMulti(spark, dir, keyCols, Seq(cntCol))

  /** [[read]] with SEVERAL summed columns per key (e.g. the per-day
    * centroid artifact's sum-vector + vector-count pair) — same one
    * bounded scan, each column summed under its own name.
    *
    * NULL poisoning (r19 long-sum audit): SQL SUM skips NULLs, but in
    * these artifacts a NULL component is an OUT-OF-ENVELOPE verdict (a
    * `try_sum`'d ingest that breached 38 digits — the sigma-stats Q),
    * not a missing observation — skipping it would merge to a silently
    * SMALLER total, the exact silent corruption the envelope contract
    * forbids. Any NULL input ⇒ NULL merged value, and the merge itself
    * is a `try_sum` so a breach first reached ACROSS tranches degrades
    * to NULL in both ANSI modes instead of throwing under the default.
    * (Count families are untouched: their components are non-null
    * counts bounded by total ingested rows.) A consolidation persists
    * the poisoned NULL — honest, since these components only grow in
    * magnitude, so a breached total never un-breaches. Tranches
    * written BEFORE the r19 writers' explicit-zero discipline can
    * carry an empty-group NULL (an all-excluded ingest group); the
    * merge reads those as breach verdicts too — a conservative NULL
    * gauge row, never a wrong one; replaying the affected ingest TAG
    * (tranches overwrite their own tag) rewrites it under the
    * explicit-zero discipline and restores the component — while it
    * is still live; once folded, the sanctioned artifact-regeneration
    * reset applies (see [[transitiveFolded]]'s growth contract). */
  def readMulti(spark: SparkSession, dir: String,
                keyCols: Seq[String], cntCols: Seq[String]): DataFrame = {
    require(cntCols.nonEmpty, "SumTranches.readMulti: need at least one count column")
    val paths = live(spark, dir)
    require(paths.nonEmpty, s"SumTranches.read: no live tranches under $dir")
    def mergeSum(c: String): org.apache.spark.sql.Column =
      when(count(when(col(c).isNull, lit(1))) > 0, lit(null))
        .otherwise(try_sum(col(c))).as(c)
    spark.read.parquet(paths.map(_.toString): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(mergeSum(cntCols.head), cntCols.tail.map(mergeSum): _*)
  }

  /** Fold the live tranches into one, crash-safe under sum (see object
    * doc for the manifest protocol). The tag is a pure function of the
    * folded names — a replayed consolidation overwrites its own
    * output; stale superseded leftovers from an earlier crash are
    * GC'd first. */
  def consolidate(spark: SparkSession, dir: String,
                  keyCols: Seq[String], cntCol: String,
                  commit: graft.merge.Merge.Commit =
                    graft.merge.Merge.RenameCommit): Unit =
    consolidateMulti(spark, dir, keyCols, Seq(cntCol), commit)

  /** AUTO-consolidation tick for long-lived ingest loops: fold only
    * when the live tranche count EXCEEDS `maxLive`, so the
    * merge-on-read fan-in is bounded by `maxLive` at every read while
    * quiet periods pay zero consolidation work. Run after each tranche
    * write (the streaming loops wire this per epoch): a tick either
    * leaves ≤ maxLive tranches untouched or folds them to ONE, so the
    * invariant `live ≤ maxLive` holds at every tick boundary — the
    * manual `consolidate` relied on an operator remembering to run it,
    * and an unattended daily ingest otherwise grows the read fan-in
    * without bound (r10 verdict #5). Returns whether a fold ran. */
  def maybeConsolidate(spark: SparkSession, dir: String,
                       keyCols: Seq[String], cntCol: String,
                       maxLive: Int,
                       commit: graft.merge.Merge.Commit =
                         graft.merge.Merge.RenameCommit): Boolean =
    maybeConsolidateMulti(spark, dir, keyCols, Seq(cntCol), maxLive, commit)

  /** [[maybeConsolidate]] for multi-count families. */
  def maybeConsolidateMulti(spark: SparkSession, dir: String,
                            keyCols: Seq[String], cntCols: Seq[String],
                            maxLive: Int,
                            commit: graft.merge.Merge.Commit =
                              graft.merge.Merge.RenameCommit): Boolean = {
    require(maxLive >= 1, s"SumTranches.maybeConsolidate: maxLive=$maxLive must be >= 1")
    if (live(spark, dir).length > maxLive) {
      consolidateMulti(spark, dir, keyCols, cntCols, commit); true
    } else false
  }

  /** TRIAGE gauge for a SUM-algebra tranche artifact in the
    * cross-family dashboard schema ([[graft.meta.IndexDashboard
    * .indexHealthAll]]): `(artifact, n_tranches, n_marked, n_unproven,
    * count_fresh)` from directory metadata only. `n_tranches` counts
    * LIVE tranches (the read-side fan-in — the consolidate dial);
    * `n_unproven` counts SUPERSEDED-but-still-visible tranches (a
    * consolidation crashed between manifest write and input delete —
    * harmless to reads, which exclude them, but awaiting GC by the
    * next consolidate); `n_marked` = live tranches carrying the
    * committer's `_SUCCESS`. `count_fresh` is NULL — sum families
    * have no separate count artifact to go stale. */
  def health(spark: SparkSession, dir0: String, artifact: String): DataFrame = {
    import spark.implicits._
    val dir = graft.merge.Merge.resolveDir(spark, dir0)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"SumTranches.health: $dir does not exist")
    val all = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSet
    val liveNames = live(spark, dir).map(_.getName).toSet
    val marked = fs.globStatus(
      new org.apache.hadoop.fs.Path(dir, "batch=*/_SUCCESS"))
      .map(_.getPath.getParent.getName).toSet
    Seq((artifact, liveNames.size, liveNames.count(marked.contains),
      (all -- liveNames).size, Option.empty[Boolean]))
      .toDF("artifact", "n_tranches", "n_marked", "n_unproven", "count_fresh")
  }

  /** [[consolidate]] for multi-count families.
    *
    * RenameCommit (default): the superseding-manifest fold — scratch →
    * manifest → one rename into place → delete inputs; crash-safe at
    * every boundary where rename is atomic (HDFS/local). On S3 the
    * rename is copy+delete, and a reader listing mid-copy can see the
    * folded tranche's DATA files before its manifest lands — counting
    * folded output AND inputs, the double-count sum famously cannot
    * shrug off. `commit = PointerCommit` closes that: the fold lands
    * as ONE fresh immutable generation holding only the folded tranche
    * (no superseding manifest needed — nothing else is visible in the
    * generation), published by a single pointer PUT with reader-graced
    * GC. Requires a pointer-committed artifact
    * ([[write]]`(…, PointerCommit)` at birth; one mode per directory). */
  def consolidateMulti(spark: SparkSession, dir0: String,
                       keyCols: Seq[String], cntCols: Seq[String],
                       commit: graft.merge.Merge.Commit =
                         graft.merge.Merge.RenameCommit): Unit = {
    val dir = graft.merge.Merge.resolveDir(spark, dir0)
    if (commit == graft.merge.Merge.PointerCommit) {
      require(dir != dir0,
        s"SumTranches.consolidate: $dir0 is not pointer-committed; " +
          "PointerCommit folds need an artifact born with " +
          "write(..., commit = PointerCommit)")
      val fsP = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val liveNow = live(spark, dir0)
      if (liveNow.length <= 1) return
      val folded = readMulti(spark, dir0, keyCols, cntCols)
      // superseding manifest INSIDE the folded tranche (r14 ADVICE #1):
      // the fresh generation holds only batch=consolidated, but a
      // REPLAYED ingest write() of an already-folded tag lands beside
      // it as a live tranche and double-counts unless the fold records
      // what it absorbed — same protocol as the rename path, names
      // carried transitively across fold chains.
      val absorbed = transitiveFolded(fsP, liveNow, "batch=consolidated")
      graft.merge.Merge.pointerSwap(spark, dir0) { gen =>
        folded.write.mode("overwrite").parquet(s"$gen/batch=consolidated")
        val mf = fsP.create(new org.apache.hadoop.fs.Path(
          s"$gen/batch=consolidated", ManifestName), true)
        try mf.write(absorbed.mkString("\n").getBytes("UTF-8")) finally mf.close()
      }
      return
    }
    // mode guard (r15 review, the swapWith/atomicReplace rule): a
    // RenameCommit fold of a POINTER-committed artifact would run the
    // rename protocol INSIDE the current generation — data-correct on
    // rename-atomic stores, but it reopens the S3 mid-copy
    // double-count window the artifact chose PointerCommit to close,
    // and it mutates a generation readers treat as swap-immutable.
    require(dir == dir0,
      s"SumTranches.consolidate: $dir0 is pointer-committed; pass " +
        "commit = PointerCommit (one commit mode per directory)")
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val all = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("batch=")).sortBy(_.getName).toSeq
    val liveNow = live(spark, dir)
    all.filterNot(liveNow.contains).foreach(t => fs.delete(t, true))
    if (liveNow.length <= 1) return
    val names = liveNow.map(_.getName)
    val tag = "consolidated-" +
      java.lang.Integer.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(names.mkString("\n")))
    val scratch = new org.apache.hadoop.fs.Path(root, s".consolidating-$tag")
    readMulti(spark, dir, keyCols, cntCols).write.mode("overwrite").parquet(scratch.toString)
    // transitive manifest (r14 ADVICE #1): fold chains must keep
    // carrying first-fold input names, or a replayed ingest of an
    // early-absorbed tag lands live after the second fold
    val absorbed = transitiveFolded(fs, liveNow, s"batch=$tag")
    val mf = fs.create(new org.apache.hadoop.fs.Path(scratch, ManifestName), true)
    try mf.write(absorbed.mkString("\n").getBytes("UTF-8")) finally mf.close()
    val dest = new org.apache.hadoop.fs.Path(root, s"batch=$tag")
    if (fs.exists(dest)) fs.delete(dest, true)
    fs.rename(scratch, dest)
    names.foreach(n => fs.delete(new org.apache.hadoop.fs.Path(root, n), true))
  }
}
