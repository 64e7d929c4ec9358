package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage timing harness for `q_decontam_dedup_split` (r14 verdict
  * #6: the composition measures 2.9× at 10× data but 25.6× at 100×,
  * and nobody had named which stage owns the second decade's slope).
  * Runs the SAME stages as the registered query — bloom build, bloom
  * contamination gate, n-gram Jaccard pair join, connected-components
  * closure, leakage-safe split — with a parquet materialization
  * boundary between stages, so each timing charges exactly one stage
  * (the composed query's lazy plan would re-attribute shared scans to
  * whoever materializes last).
  *
  *   java ... graft.DecontamStages <sfDir> [workDir]
  *
  * Prints one `[stage]` line per stage and a final JSON summary.
  */
object DecontamStages {

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/tmp/graft_sf1")
    val work = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_decontam_stages").toString)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    Graft.coreTune()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Graft.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    import graft.dedup.DedupOps
    import graft.graph.GraphOps

    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def timed[T](name: String)(body: => T): T = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      val r = body
      val s = (System.nanoTime() - t0) / 1e9
      timings(name) = s
      println(f"[stage] $name%-12s $s%8.3f s")
      r
    }

    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
    val bench = docs.where(col("doc_id") < 25)
    val bloomDir = s"$work/bloom"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(bloomDir))

    timed("bloom_build") {
      DedupOps.benchmarkShingleBloom(bench, "text", bloomDir, "s0", shingleN = 8)
    }
    timed("bloom_gate") {
      docs.join(
        DedupOps.contaminationCheckViaBloom(docs, bench, bloomDir,
            "doc_id", "text", shingleN = 8)
          .where(col("n_contaminated") === 0).select("doc_id"),
        Seq("doc_id"), "left_semi")
        .write.mode("overwrite").parquet(s"$work/clean")
    }
    val clean = spark.read.parquet(s"$work/clean")
    timed("jaccard_pairs") {
      val (pairs, release) = DedupOps.ngramJaccardPairsReleasable(
        clean, "doc_id", "text", shingleN = 3, threshold = 0.5, maxBucket = 1000)
      pairs.write.mode("overwrite").parquet(s"$work/pairs")
      release()
    }
    // the sig-tier twin of jaccard_pairs (r15 verdict #5): same clean
    // input, banded-MinHash join instead of the exact pair join — the
    // per-decade gap between these two rows IS the sig tier's case
    timed("sig_pairs") {
      val (pairs, release) = DedupOps.minhashNearDupPairsReleasable(
        clean, "doc_id", "text", shingleN = 3, k = 16, bands = 8,
        threshold = 0.4, portable = true)
      pairs.write.mode("overwrite").parquet(s"$work/pairs_sig")
      release()
    }
    timed("cc_closure") {
      GraphOps.connectedComponents(
        spark.read.parquet(s"$work/pairs"), "id_a", "id_b")
        .write.mode("overwrite").parquet(s"$work/cc")
    }
    timed("split") {
      graft.training.TrainingOps.leakageSafeSplit(
        clean.select("doc_id"), "doc_id", spark.read.parquet(s"$work/cc"),
        Seq(("train", 0.9), ("val", 0.05), ("test", 0.05)),
        salt = "plsplit", portable = true)
        .write.format("noop").mode("overwrite").save()
    }
    val total = timings.values.sum
    println(s"""{"sf_dir":"$sfDir","stages":{""" +
      timings.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }.mkString(",") +
      s"""},"total":${f"$total%.3f"}}""")
    spark.stop()
  }
}
