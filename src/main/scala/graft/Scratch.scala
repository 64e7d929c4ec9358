package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time named `SparkEntry.queries` entries in isolation,
  * with the same confs as [[Bench]].
  *
  *   sbt "runMain graft.Scratch q_curation /root/testdata/sf0.1 3"
  *   sbt "runMain graft.Scratch q_a,q_b,q_c /root/testdata/sf0.1 3"
  *
  * (comma-separated query names, sf dir, repetitions per query).
  * Prints per-run seconds — cold first, warm after — so a suite number
  * can be attributed to the plan or to suite-order effects without
  * running all 200+ queries. With `GRAFT_SCRATCH_JSON=<path>` also
  * writes `{"name": minSeconds}` over all reps (cold included — a
  * valid observation that can only tighten the min): the SETTLED-FLOOR
  * format `Bench`'s drift adjudication reads from `floors.json`.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q1_agg")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // floor-settle host canary (r15 verdict #2) measured BEFORE the
    // Spark session exists — the same clean-JVM conditions Bench's
    // open-time canary runs under; measuring after the query reps
    // would read systematically slow (JIT/GC debt) and understate
    // future host factors
    val canary = sys.env.get("GRAFT_SCRATCH_JSON")
      .map(_ => graft.HostCanary.sec(sfDir))
    Graft.coreTune()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Graft.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val unknown = names.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty)
      sys.error(s"unknown queries ${unknown.mkString(", ")}; known: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
    val mins = names.map { name =>
      val fn = SparkEntry.queries(name)
      // GRAFT_EXPLAIN=1 dumps the formatted physical plan before timing —
      // the plan-audit loop (exchange reuse, pushed filters, codegen spans)
      if (sys.env.get("GRAFT_EXPLAIN").contains("1"))
        fn(spark, sfDir).explain("formatted")
      val secs = (1 to reps).map { i =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[scratch] $name run $i: $s%.3f s")
        s
      }
      name -> secs.min
    }
    sys.env.get("GRAFT_SCRATCH_JSON").foreach { path =>
      // MERGE with the existing file (r13 ADVICE #4): the documented
      // floors workflow loops `for q in ...; do GRAFT_SCRATCH_JSON=x
      // Scratch $q; done` against ONE path — truncating per run would
      // leave only the last query's floor, a silently near-empty
      // floors.json the PlanAuditSpec non-empty check can't catch.
      // Existing floors are kept; a re-measured query's fresh min
      // REPLACES its old floor (not min-of-both: after a deliberate
      // plan change that legitimately slows a query, the point of
      // re-measuring is to loosen the floor — min would pin the stale
      // tight one forever).
      // floor-settle-time host canary rides INSIDE floors.json (r15
      // verdict #2): Bench's drift cascade divides its own bench-time
      // canary by this figure to normalize floors for measured host
      // drift. Since r17 (r16 verdict #4) each floor measured THIS RUN
      // additionally gets its own `__canary_<query>` stamp, so floors
      // settled in different host windows normalize independently; the
      // global key stays as the fallback for unstamped (pre-r17)
      // floors and keeps tracking the latest settle.
      // `__cpus` stamp (r20, r19 verdict "what's wrong" #6): floors are
      // cpu-count-specific measurements; Bench skips floor adjudication
      // when its $SPARK_GRAFT_CPUS differs from the settle cpus, instead
      // of manufacturing false regressed?/LOOSE-FLOOR flags at 8 cores
      // against 32-core floors.
      val n = writeFloors(path,
        floorsPayload(mins, canary) :+ ("__cpus" -> cpus.toDouble))
      println(s"[scratch] wrote $path ($n floors, ${mins.size} measured this run)")
    }
    spark.stop()
  }

  /** The floors-file entries one settle run contributes: the measured
    * minima, plus — when a canary was taken — the global latest-settle
    * key AND a per-floor `__canary_<query>` stamp for each query
    * measured THIS run (never for floors merely carried over, whose
    * stamps must keep describing their own settle windows). Factored
    * from main() so the stamping contract is spec-testable. */
  private[graft] def floorsPayload(mins: Seq[(String, Double)],
                                   canary: Option[Double]): Seq[(String, Double)] =
    mins ++ canary.toSeq.flatMap(c =>
      (HostCanary.FloorKey -> c) +:
        mins.map { case (q, _) => HostCanary.floorKeyFor(q) -> c })

  /** Overlay `mins` onto the floors already in `path` and rewrite it;
    * returns the merged count. Kept separate from main() so the
    * merge-not-truncate contract is spec-testable. */
  private[graft] def writeFloors(path: String, mins: Seq[(String, Double)]): Int = {
    val merged = (Bench.settledFloors(path) ++ mins).toSeq
    val json = merged.sortBy(_._1).map { case (n, s) =>
      f""""$n": ${s}%.3f"""
    }.mkString("{\n  ", ",\n  ", "\n}\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
    merged.size
  }
}
