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

  /** One ingest = one tranche, overwriting its own tag (replay-safe). */
  def write(counts: DataFrame, dir: String, tag: String): Unit =
    counts.write.mode("overwrite").parquet(s"$dir/batch=$tag")

  /** Tranches a reader should count: every `batch=*` minus any named
    * in a surviving consolidated tranche's manifest. */
  def live(spark: SparkSession, dir: String): Seq[org.apache.hadoop.fs.Path] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val tranches = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("batch=")).sortBy(_.getName).toSeq
    val superseded: Set[String] = tranches.flatMap { t =>
      val mf = new org.apache.hadoop.fs.Path(t, ManifestName)
      if (fs.exists(mf)) {
        val in = fs.open(mf)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      } else Nil
    }.toSet
    tranches.filterNot(t => superseded(t.getName))
  }

  /** Merge-on-read: one scan over the live tranches, key-wise sum —
    * bounded by Σ tranche sizes, never a corpus. */
  def read(spark: SparkSession, dir: String,
           keyCols: Seq[String], cntCol: String): DataFrame =
    readMulti(spark, dir, keyCols, Seq(cntCol))

  /** [[read]] with SEVERAL summed columns per key (e.g. the per-day
    * centroid artifact's sum-vector + vector-count pair) — same one
    * bounded scan, each column summed under its own name. */
  def readMulti(spark: SparkSession, dir: String,
                keyCols: Seq[String], cntCols: Seq[String]): DataFrame = {
    require(cntCols.nonEmpty, "SumTranches.readMulti: need at least one count column")
    val paths = live(spark, dir)
    require(paths.nonEmpty, s"SumTranches.read: no live tranches under $dir")
    spark.read.parquet(paths.map(_.toString): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(cntCols.head)).as(cntCols.head),
        cntCols.tail.map(c0 => sum(col(c0)).as(c0)): _*)
  }

  /** Fold the live tranches into one, crash-safe under sum (see object
    * doc for the manifest protocol). The tag is a pure function of the
    * folded names — a replayed consolidation overwrites its own
    * output; stale superseded leftovers from an earlier crash are
    * GC'd first. */
  def consolidate(spark: SparkSession, dir: String,
                  keyCols: Seq[String], cntCol: String): Unit =
    consolidateMulti(spark, dir, keyCols, Seq(cntCol))

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
                       maxLive: Int): Boolean =
    maybeConsolidateMulti(spark, dir, keyCols, Seq(cntCol), maxLive)

  /** [[maybeConsolidate]] for multi-count families. */
  def maybeConsolidateMulti(spark: SparkSession, dir: String,
                            keyCols: Seq[String], cntCols: Seq[String],
                            maxLive: Int): Boolean = {
    require(maxLive >= 1, s"SumTranches.maybeConsolidate: maxLive=$maxLive must be >= 1")
    if (live(spark, dir).length > maxLive) {
      consolidateMulti(spark, dir, keyCols, cntCols); true
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
  def health(spark: SparkSession, dir: String, artifact: String): DataFrame = {
    import spark.implicits._
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

  /** [[consolidate]] for multi-count families. */
  def consolidateMulti(spark: SparkSession, dir: String,
                       keyCols: Seq[String], cntCols: Seq[String]): Unit = {
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
    val mf = fs.create(new org.apache.hadoop.fs.Path(scratch, ManifestName), true)
    try mf.write(names.mkString("\n").getBytes("UTF-8")) finally mf.close()
    val dest = new org.apache.hadoop.fs.Path(root, s"batch=$tag")
    if (fs.exists(dest)) fs.delete(dest, true)
    fs.rename(scratch, dest)
    names.foreach(n => fs.delete(new org.apache.hadoop.fs.Path(root, n), true))
  }
}
