package graft.meta

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** Ingestion metadata columns + time-partition key scheme.
  *
  * Every ingested table in the reference carries three standard META
  * columns (`add_metadata` `src/pyveb/spark_client.py:399-416`,
  * `src/pyveb/parser.py:6-14`) and lands under a Hive-style
  * `year=/month=/day=[/hour=...]` prefix (`create_partition_key`
  * `src/pyveb/common.py:47-61`, granularities `src/pyveb/config.py:77-108`).
  */
object MetaOps {

  val FileName = "META_file_name"
  val PartitionDate = "META_partition_date"
  val ProcessingDate = "META_processing_date_utc"
  val All: Seq[String] = Seq(FileName, PartitionDate, ProcessingDate)

  /** Append the three META columns. `fileName` defaults to the source
    * file of each row (`input_file_name()`), as in the reference.
    * `partitionDate` is the logical load date (Airflow execution date
    * there); `processing` defaults to now-UTC.
    */
  def addMetadata(df: DataFrame,
                  partitionDate: LocalDateTime,
                  fileName: Option[String] = None,
                  processing: Option[LocalDateTime] = None): DataFrame = {
    val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    df.withColumn(FileName, fileName.map(lit).getOrElse(input_file_name()))
      .withColumn(PartitionDate, lit(partitionDate.format(fmt)).cast(TimestampNTZType))
      .withColumn(ProcessingDate,
        processing.map(p => lit(p.format(fmt)).cast(TimestampNTZType))
          .getOrElse(current_timestamp().cast(TimestampNTZType)))
  }

  /** Partition-key path for a load date at a given granularity —
    * `year=YYYY/month=MM/day=DD[/hour=HH[/minute=mm[/second=ss]]]/`.
    * Reference: `src/pyveb/common.py:47-61`, `src/pyveb/config.py:77-108`.
    */
  def partitionKey(dt: LocalDateTime, granularity: String = "day"): String = {
    val parts = Seq(
      "year" -> f"${dt.getYear}%04d", "month" -> f"${dt.getMonthValue}%02d",
      "day" -> f"${dt.getDayOfMonth}%02d", "hour" -> f"${dt.getHour}%02d",
      "minute" -> f"${dt.getMinute}%02d", "second" -> f"${dt.getSecond}%02d")
    val n = granularity match {
      case "day" => 3; case "hour" => 4; case "minute" => 5; case "second" => 6
      case other => throw new IllegalArgumentException(s"granularity $other")
    }
    parts.take(n).map { case (k, v) => s"$k=$v" }.mkString("", "/", "/")
  }

  /** Stable content identity over selected fields: sha256 of the
    * '|'-joined values (NULL → empty). The engine-side form of the
    * reference's hash-based record identity
    * (`/root/reference/src/pyveb/dbt_client.py:45-58`: sha256 of
    * id+state+created_at on typed API records) — used to detect changed
    * rows across extracts without comparing every column.
    */
  def hashIdentity(cols: Seq[String]): org.apache.spark.sql.Column =
    sha2(concat_ws("|", cols.map(c => coalesce(col(c).cast("string"), lit(""))): _*), 256)

  /** Add `year/month/day` columns derived from a timestamp column so a
    * writer can `partitionBy` them — the engine-native form of the
    * reference's partition prefixes (Spark then partition-prunes reads).
    */
  def withPartitionColumns(df: DataFrame, tsCol: String): DataFrame =
    df.withColumn("year", date_format(col(tsCol), "yyyy"))
      .withColumn("month", date_format(col(tsCol), "MM"))
      .withColumn("day", date_format(col(tsCol), "dd"))
}
