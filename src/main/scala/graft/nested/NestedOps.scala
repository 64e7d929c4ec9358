package graft.nested

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nested / array / struct / semi-structured operators (SURVEY.md §2.7).
  *
  * All array ops use Spark's higher-order functions (codegen'd, no UDFs,
  * no JVM↔Python round-trips — the reference's arg-max op forced the
  * whole plan through `read.json(df.rdd.map(...))` plus a Python UDF,
  * `src/pyveb/spark_client.py:385-395`; here it is one expression).
  */
object NestedOps {

  /** Replace a struct column by its fields (promoted to top level).
    * Reference: `flatten_struct` `src/pyveb/spark_client.py:483-491`. */
  def flattenStruct(df: DataFrame, structCol: String): DataFrame = {
    val others = df.columns.filter(_ != structCol).map(col)
    df.select((others :+ col(structCol + ".*")).toIndexedSeq: _*)
  }

  /** Explode an array column keeping NULL/empty rows (`explode_outer`).
    * If the column is a *string* of the form "[a, b, c]" (a stringified
    * list), strip whitespace, unwrap the brackets, split on ',' and
    * explode the pieces — the reference's string path
    * (`src/pyveb/spark_client.py:531-535`).
    * Reference: `explode_column` `src/pyveb/spark_client.py:505-540`.
    */
  def explodeColumn(df: DataFrame, c: String): DataFrame = {
    val exploded = df.schema(c).dataType match {
      case _: ArrayType => explode_outer(col(c))
      case StringType =>
        // let-bound: `inner` feeds both the guard and the split — an
        // unbound reference would run the two regexes twice per row
        explode_outer(graft.functions.Let.bind(
          regexp_extract(regexp_replace(col(c), "\\s", ""), "^\\[(.*)\\]$", 1)) { inner =>
          when(length(inner) > 0, split(inner, ","))
        })
      case other =>
        throw new IllegalArgumentException(s"explodeColumn: $c is $other, need array or string")
    }
    df.withColumn(c, exploded)
  }

  /** Drop array elements whose nested array field is empty:
    * `filter(arr, x -> size(x.field) > 0)`.
    * Reference: `filter_empty_from_array` `src/pyveb/spark_client.py:493-503`. */
  def filterEmptyFromArray(df: DataFrame, arrCol: String, field: String): DataFrame =
    df.withColumn(arrCol, filter(col(arrCol), x => size(x.getField(field)) > 0))

  /** Keep only the array element with the maximum `sortField` (arg-max
    * within each row's array). NULL/empty arrays → NULL.
    * Reference: `udf_filter_max_from_array` + `filter_max_from_array`
    * `src/pyveb/spark_client.py:321-328,385-395` (JSON round-trip + UDF
    * there; a single `aggregate` HOF here).
    */
  def argMaxInArray(df: DataFrame, arrCol: String, sortField: String): DataFrame = {
    val arr = col(arrCol)
    val reduced = aggregate(
      arr,
      element_at(arr, 1),
      (acc, x) => when(x.getField(sortField) > acc.getField(sortField), x).otherwise(acc))
    df.withColumn(arrCol, when(size(arr) > 0, reduced))
  }

  /** Parse a JSON string column with an explicit schema. */
  def parseJson(df: DataFrame, c: String, schema: DataType): DataFrame =
    df.withColumn(c, from_json(col(c), schema))

  /** Infer the schema of a JSON string column by parsing a sample, then
    * `from_json` the whole column with it — the declared-schema analog of
    * the reference's `read.json(df.rdd).schema` round-trip
    * (`src/pyveb/spark_client.py:390-393`). The inference pass reads only
    * `sample` rows; the main plan stays lazy.
    */
  def parseJsonInferred(spark: SparkSession, df: DataFrame, c: String,
                        sample: Int = 1000): DataFrame = {
    import spark.implicits._
    val ds = df.select(col(c)).na.drop().limit(sample).as[String]
    val schema = spark.read.json(ds).schema
    parseJson(df, c, schema)
  }

  /** Serialize columns to a JSON string (the reference's DF→API-params
    * path, `create_api_params_from_df` `src/pyveb/api_client.py:209-230`). */
  def toJsonParams(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("params"))
}
