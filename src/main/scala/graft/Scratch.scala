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
      val json = mins.sortBy(_._1).map { case (n, s) =>
        f""""$n": ${s}%.3f"""
      }.mkString("{\n  ", ",\n  ", "\n}\n")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
      println(s"[scratch] wrote $path (${mins.size} floors)")
    }
    spark.stop()
  }
}
