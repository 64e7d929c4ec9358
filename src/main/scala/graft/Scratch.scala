package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time one named `SparkEntry.queries` entry in isolation,
  * with the same confs as [[Bench]].
  *
  *   sbt "runMain graft.Scratch q_curation /root/testdata/sf0.1 3"
  *
  * (query name, sf dir, repetitions). Prints per-run seconds — cold
  * first, warm after — so a suite number can be attributed to the plan
  * or to suite-order effects without running all 90+ queries.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_agg")
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
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    // GRAFT_EXPLAIN=1 dumps the formatted physical plan before timing —
    // the plan-audit loop (exchange reuse, pushed filters, codegen spans)
    if (sys.env.get("GRAFT_EXPLAIN").contains("1"))
      fn(spark, sfDir).explain("formatted")
    for (i <- 1 to reps) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[scratch] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
