package graft.io

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JDBC sources (SURVEY.md §2.1: `query_to_df`, `query_fetch_single_value`,
  * `query_to_list` — the reference pulls whole result sets through a
  * single ODBC cursor into pandas; here the read is a Spark JDBC scan,
  * and the scale path is [[readPartitioned]]: N executors each issue a
  * range-bounded query, so a 10⁹-row extract parallelizes instead of
  * serializing through one connection).
  */
object Jdbc {

  private def props(extra: Map[String, String]): Properties = {
    val p = new Properties()
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Arbitrary-query read (one connection — fine for small/dim reads;
    * use [[readPartitioned]] for big fact extracts).
    * Reference: `query_to_df` `src/pyveb/lynx_client.py:94-107`. */
  def read(spark: SparkSession, url: String, query: String,
           options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("query", query)
      .options(options)
      .load()

  /** Range-partitioned table read: `numPartitions` concurrent
    * connections each scanning `[lower, upper]` slices of
    * `partitionColumn` — the distributed replacement for the
    * reference's fetchmany cursor loop (`rs_client.py:537-551`). */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lower: Long, upper: Long,
                      numPartitions: Int,
                      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lower, upper, numPartitions,
      props(options))

  /** Scalar fetch (incremental watermarks).
    * Reference: `query_fetch_single_value` `src/pyveb/lynx_client.py:83-92`. */
  def fetchScalar(spark: SparkSession, url: String, query: String): Option[Any] = {
    val row = read(spark, url, query).head()
    if (row.isNullAt(0)) None else Some(row.get(0))
  }

  /** Rows + column metadata (driver-side, small results only).
    * Reference: `query_to_list` `src/pyveb/lynx_client.py:65-81`. */
  def rowsAndSchema(spark: SparkSession, url: String, query: String)
      : (Seq[org.apache.spark.sql.Row], StructType) = {
    val df = read(spark, url, query)
    (df.collect().toSeq, df.schema)
  }

  /** Write a frame to a JDBC table (used by tests to seed embedded DBs;
    * the reference's warehouse loads go through [[graft.merge.Merge]]). */
  def write(df: DataFrame, url: String, table: String,
            mode: String = "overwrite",
            options: Map[String, String] = Map.empty): Unit =
    df.write.mode(mode).jdbc(url, table, props(options))
}
