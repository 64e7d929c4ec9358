package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Graft.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup outside the timed section: exercise the scan,
    // shuffle (groupBy), broadcast-join, and window machinery once on a
    // tiny table so the first timed query doesn't absorb ~2s of JVM
    // warmup that belongs to no operator
    try {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val region = spark.read.parquet(s"$sfDir/region.parquet")
      val nation = spark.read.parquet(s"$sfDir/nation.parquet")
      nation.join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy("r_name").agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(Window.orderBy(col("n").desc, col("r_name"))))
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // operators that persist intermediates (LSH/jaccard) must not
      // bleed storage pressure into later queries
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      // noop sink materializes every output column (count() would let
      // Catalyst prune projection-only queries down to metadata reads)
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // a failed query must not read as a fast success: sentinel -1.
    // 3-decimal rounding keeps the whole line inside the driver's
    // bounded tail-capture window (a full-precision map of 79 queries
    // overflowed it and the line arrived front-truncated → unparseable)
    def r3(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v, ok) => s"\"" + k + "\":" + (if (ok) r3(v) else "-1") }
      .mkString("{", ",", "}")
    val failed = results.filterNot(_._3).map(_._1)
    val total = results.filter(_._3).map(_._2).sum + failed.size * 1e6 // failures poison the total
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","failed":${failed.size}}""")
    spark.stop()
  }
}
