package graft.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema enforcement: the reference's declared-then-enforced model
  * (SURVEY.md §1.3). Schemas are never inferred at query time; every
  * ingested table is cast-by-projection onto a declared StructType so
  * that parquet parts with drifted types (e.g. all-NULL columns read
  * back as double) converge deterministically.
  *
  * All ops here are pure `DataFrame => DataFrame` projections — single
  * Catalyst `Project` nodes, fully codegen'd, zero shuffles, so they
  * compose freely at any scale.
  */
object SchemaOps {

  /** Cast every schema column to its target type, keeping the frame's
    * column order. Strict cast (invalid values error under ANSI / become
    * NULL under legacy); use [[applySchema]] for lenient semantics.
    * Reference: `enforce_schema` `src/pyveb/spark_client.py:418-428`.
    */
  def enforceSchema(df: DataFrame, schema: StructType): DataFrame = {
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap
    df.select(df.columns.map { c =>
      byName.get(c).map(t => col(c).cast(t).as(c)).getOrElse(col(c))
    }.toIndexedSeq: _*)
  }

  /** Those types the reference casts leniently (invalid → NULL),
    * `src/pyveb/spark_client.py:248-253`. */
  private def lenient(t: DataType): Boolean = t match {
    case TimestampType | TimestampNTZType | BooleanType | IntegerType |
         LongType | DoubleType | DateType => true
    case _ => false
  }

  /** Reorder columns to schema order, then cast each to the schema type —
    * `try_cast` (invalid data → NULL, never fail) for
    * timestamp/boolean/int/long/double/date, plain cast otherwise.
    * Columns absent from the frame are added as typed NULLs so the output
    * schema is always exactly `schema` (multi-part reads with missing
    * columns stay unionable).
    * Reference: `apply_schema` `src/pyveb/spark_client.py:236-264`.
    */
  def applySchema(df: DataFrame, schema: StructType): DataFrame = {
    val have = df.columns.toSet
    df.select(schema.fields.map { f =>
      if (!have.contains(f.name)) lit(null).cast(f.dataType).as(f.name)
      else if (lenient(f.dataType))
        expr(s"try_cast(`${f.name}` AS ${f.dataType.sql})").as(f.name)
      else col(f.name).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }

  /** Projection in an explicit column order.
    * Reference: `reindex_cols` `src/pyveb/spark_client.py:434-443`. */
  def reindexCols(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*)

  /** Drop N columns (missing names ignored, as in Spark's `drop`).
    * Reference: `drop_cols` `src/pyveb/spark_client.py:542-549`. */
  def dropCols(df: DataFrame, cols: Seq[String]): DataFrame =
    df.drop(cols: _*)

  /** Bulk rename via map; columns not in the map pass through.
    * Reference: `rename_columns` `src/pyveb/spark_client.py:552-561`. */
  def renameColumns(df: DataFrame, renames: Map[String, String]): DataFrame =
    df.withColumnsRenamed(renames)

  /** Characters the reference strips from column names before they reach
    * a schema (`src/pyveb/parser.py:78,103`). */
  private val BadNameChars = "[ (),;{}\\n\\t=]"

  def sanitizeName(name: String): String = name.replaceAll(BadNameChars, "")

  /** Rewrite all column names through [[sanitizeName]]. */
  def sanitizeColumnNames(df: DataFrame): DataFrame =
    df.withColumnsRenamed(
      df.columns.filter(c => sanitizeName(c) != c)
        .map(c => c -> sanitizeName(c)).toMap)
}
