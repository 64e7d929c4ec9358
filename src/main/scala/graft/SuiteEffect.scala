package graft

import org.apache.spark.sql.SparkSession

/** Diagnosis tool for the WARM-SUITE INFLATION (r16 verdict #2):
  * `q_cooccurrence_index` reads 13.0 s warm in-suite vs 6.7 s
  * isolated, `q_cm_counts` 4.3 vs 2.1 — the drift cascade labels the
  * gap `suite-noise(floor)` but nothing names the MECHANISM. This
  * main replays the suite context in a controlled way so the
  * candidate mechanisms separate:
  *
  *   - `same`:  run the first `nPrefix` registered queries (the exact
  *     alphabetical order Bench's cold pass uses), then time the
  *     target — reproduces the in-suite condition.
  *   - `fresh`: same prefix, then `spark.stop()` and a NEW session in
  *     the SAME JVM before timing the target — if the gap vanishes,
  *     the residue lives in SparkContext-scoped state (listener
  *     status stores, block/shuffle registries); if it persists, the
  *     JVM itself (JIT deopt/code cache/heap shape) owns it.
  *   - `GRAFT_SUITE_CONFS=k=v,...`: extra session confs (e.g. tiny
  *     `spark.ui.retained*` / `spark.sql.ui.retainedExecutions`) to
  *     bisect the listener-retention hypothesis inside `same` mode.
  *
  * Per target rep it prints wall seconds and GC-time delta; per cell
  * it prints the retained-job count (status-store size proxy) and the
  * disk footprint of this JVM's spark scratch dirs (page-cache /
  * shuffle-residue proxy). One JSON line at the end, floors-style.
  *
  *   java ... graft.SuiteEffect q_cm_counts /root/testdata/sf0.1 60 same 3
  */
object SuiteEffect {

  private def gcMillis: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
  }

  /** Disk MB under this-JVM spark scratch dirs (blockmgr-*, spark-*)
    * in java.io.tmpdir — shuffle-file residue proxy. Racing
    * ContextCleaner's concurrent shuffle cleanup is benign by
    * construction (r17 verdict #6 review): `listFiles` of a
    * just-deleted dir returns null (guarded), `length()` of a
    * just-deleted file returns 0 — the walk can only UNDER-count a
    * purely diagnostic figure, never throw or over-report. */
  private def scratchMb(): Long = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val roots = Option(tmp.listFiles()).getOrElse(Array.empty).filter(f =>
      f.isDirectory && (f.getName.startsWith("blockmgr-") || f.getName.startsWith("spark-")))
    def du(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).getOrElse(Array.empty).map(du).sum
    roots.map(du).sum / (1024 * 1024)
  }

  def main(args: Array[String]): Unit = {
    val target = args.headOption.getOrElse("q_cm_counts")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val nPrefix = args.lift(2).map(_.toInt).getOrElse(0)
    val mode = args.lift(3).getOrElse("same") // same | fresh
    val reps = args.lift(4).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val extra = sys.env.get("GRAFT_SUITE_CONFS").toSeq.flatMap(_.split(","))
      .map(_.split("=", 2)).collect { case Array(k, v) => (k, v) }

    def newSession(): SparkSession = {
      Graft.coreTune()
      val b = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
      extra.foreach { case (k, v) => b.config(k, v) }
      val s = b.getOrCreate()
      Graft.tune(s)
      s.sparkContext.setLogLevel("ERROR")
      s
    }

    var spark = newSession()
    val mem = java.lang.management.ManagementFactory.getMemoryMXBean

    def hygiene(): Unit = { // Bench.runOne's between-queries hygiene
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val h = mem.getHeapMemoryUsage
      if (h.getMax > 0 && h.getUsed.toDouble / h.getMax > 0.6) System.gc()
    }

    val names = SparkEntry.queries.keys.toSeq.sorted.filterNot(_ == target).take(nPrefix)
    val tp0 = System.nanoTime()
    names.foreach { n =>
      hygiene()
      try SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[suite-effect] prefix $n FAILED: ${e.getMessage}")
      }
    }
    val prefixSec = (System.nanoTime() - tp0) / 1e9

    if (mode == "fresh") { spark.stop(); spark = newSession() }

    val preMb = scratchMb()
    val jobs = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val runs = (1 to reps).map { i =>
      hygiene()
      val g0 = gcMillis
      val t0 = System.nanoTime()
      SparkEntry.queries(target)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      val g = (gcMillis - g0) / 1e3
      println(f"[suite-effect] $target run $i: $s%.3f s  gc $g%.3f s")
      (s, g)
    }
    println(s"""{"tool":"suite_effect","target":"$target","mode":"$mode",""" +
      s""""n_prefix":$nPrefix,"prefix_sec":${f"$prefixSec%.1f"},""" +
      s""""retained_jobs":$jobs,"scratch_mb_before_target":$preMb,""" +
      s""""runs":[${runs.map(r => f"${r._1}%.3f").mkString(",")}],""" +
      s""""gc":[${runs.map(r => f"${r._2}%.3f").mkString(",")}],""" +
      s""""extra_confs":"${extra.map(kv => kv._1 + "=" + kv._2).mkString(",")}"}""")
    spark.stop()
  }
}
