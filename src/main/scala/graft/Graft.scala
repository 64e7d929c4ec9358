package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session factory + canonical test-table loader.
  *
  * Replaces the reference's session bootstrap
  * (`src/pyveb/spark_client.py:51-99`): UTC session timezone, tuned
  * parallelism. Unlike the reference we keep whole-stage codegen ON
  * (the 64KB-codegen workaround it disables codegen for is solved in
  * Spark 3/4 by `spark.sql.codegen.hugeMethodLimit` splitting) and we
  * enable AQE so skewed joins / small partitions re-plan at runtime —
  * essential posture for the 100 TB target.
  */
object Graft {

  /** Runtime confs applied on top of whatever session the host (driver
    * harness, test suite, notebook) created. All of these are safe to
    * set per-session at runtime.
    */
  def tune(spark: SparkSession): SparkSession = {
    val c = spark.conf
    c.set("spark.sql.session.timeZone", "UTC")
    // testdata `events.ts` is parquet INT64 TIMESTAMP(NANOS) which Spark
    // refuses by default; read as Long and convert explicitly (Tables.events).
    c.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    c.set("spark.sql.adaptive.enabled", "true")
    c.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    c.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark
  }

  def session(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession =
    tune(
      SparkSession.builder()
        .master(master)
        .appName("graft")
        .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
}

/** Loader for the driver-generated test tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table; `events` gets its ns-precision timestamp converted
    * to TIMESTAMP_NTZ (µs, truncating — same as DuckDB's ns→µs cast).
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    Graft.tune(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
    else df
  }
}
