package graft.clean

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Null-normalization / lenient-cast cleaning operators.
  *
  * These encode the reference's data-hygiene semantics (SURVEY.md §2.2,
  * §2.8) as native Catalyst expressions — the reference used Python UDFs
  * for several of them (`src/pyveb/spark_client.py:269-328`), which
  * serialize every row across the JVM↔Python boundary; here everything
  * is a codegen'd `Project`, so the ops are shuffle-free and scale
  * linearly with input splits.
  */
object CleanOps {

  /** String variants treated as "missing" by the reference
    * (`src/pyveb/spark_client.py:463-481`): after trim+lower,
    * `nan`, `null`, and the empty string. */
  private val NanTokens = Seq("nan", "null", "")

  /** String columns: trim+lower ∈ {"nan","null",""} → NULL, else keep
    * the ORIGINAL (untrimmed) value.
    * Reference: `nan_to_null` `src/pyveb/spark_client.py:463-481`.
    *
    * @param cols columns to normalize; default = all string columns.
    */
  def nanToNull(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val targets =
      if (cols.nonEmpty) cols
      else df.schema.fields.collect { case f if f.dataType == StringType => f.name }.toSeq
    df.withColumns(targets.map { c =>
      c -> when(lower(trim(col(c))).isin(NanTokens: _*), lit(null).cast(StringType))
        .otherwise(col(c))
    }.toMap)
  }

  /** Literal string tokens the pandas bridge produces for missing values
    * (`src/pyveb/tf_client.py:99-114`): '', ' ', '  ', 'NaN', 'NaT'. */
  private val EmptyTokens = Seq("", " ", "  ", "NaN", "NaT")

  /** Numeric columns: `isnan` → NULL. String columns: exact match on the
    * pandas missing-tokens → NULL.
    * Reference: `spark_empty_and_nan_to_null` `src/pyveb/tf_client.py:99-114`.
    */
  def emptyAndNanToNull(df: DataFrame): DataFrame =
    df.withColumns(df.schema.fields.flatMap { f =>
      f.dataType match {
        case DoubleType | FloatType =>
          Some(f.name -> when(isnan(col(f.name)), lit(null).cast(f.dataType)).otherwise(col(f.name)))
        case StringType =>
          Some(f.name -> when(col(f.name).isin(EmptyTokens: _*), lit(null).cast(StringType)).otherwise(col(f.name)))
        case _ => None
      }
    }.toMap)

  private val Epoch1900: Column = lit("1900-01-01 00:00:00").cast(TimestampNTZType)

  /** Clamp pre-1900 timestamps to 1900-01-01 (the reference's workaround
    * for proleptic-calendar round-trip bugs, SPARK-31404).
    * Reference: `clean_old_dates` `src/pyveb/spark_client.py:445-461`.
    */
  def cleanOldDates(df: DataFrame, cols: Seq[String]): DataFrame =
    df.withColumns(cols.map { c =>
      val t = col(c).cast(TimestampNTZType)
      c -> when(t < Epoch1900, Epoch1900).otherwise(t)
    }.toMap)

  /** NULL timestamps → a fixed sentinel so composite upsert keys stay
    * comparable. Reference uses `1111-01-01`
    * (`pandas_format_timestamps` `src/pyveb/tf_client.py:48-55`).
    */
  def sentinelTimestamps(df: DataFrame, cols: Seq[String],
                         sentinel: String = "1111-01-01 00:00:00"): DataFrame =
    df.withColumns(cols.map { c =>
      c -> coalesce(col(c), lit(sentinel).cast(df.schema(c).dataType))
    }.toMap)

  /** Null-safe float → int truncation; repairs INT columns that became
    * float because some parquet parts were all-NULL.
    * Reference: `udf_float_to_int` + `convert_float_to_int_int`
    * `src/pyveb/spark_client.py:269-279,330-343` (a Python UDF there;
    * a plain cast here — Spark double→int truncates toward zero exactly
    * like Python's `int()`).
    *
    * THROW is the documented out-of-envelope semantics (r19 ANSI cast
    * audit): this is a REPAIR op whose contract is "the column really
    * holds INT-ranged values, parquet just widened it" — a NaN or a
    * magnitude beyond int means the column was never an INT column,
    * and silently nulling it would corrupt the repair. Under ANSI mode
    * (Spark 4's default) such a value fails the job loudly; use
    * [[stringToInt]]-style lenient conversion when junk is expected.
    */
  def floatToInt(df: DataFrame, cols: Seq[String]): DataFrame =
    df.withColumns(cols.map(c => c -> col(c).cast(IntegerType)).toMap)

  /** Lenient string → int: ''/junk → NULL (try_cast), truncating any
    * fractional part first so "1.5" → 1 (Python `int(float(x))` shape —
    * the reference's UDF raised on "1.5"; we document truncation as the
    * engine's canonical behavior, SURVEY.md §7.5.3). The OUTER cast is
    * a try_cast too (r19 ANSI cast audit): a finite numeric beyond int
    * range ("3e10") is junk FOR AN INT COLUMN, so the lenient contract
    * makes it NULL — the plain cast would throw under ANSI mode
    * (Spark 4's default) and kill the cleaning job on one wild cell.
    * Reference: `udf_string_to_int` `src/pyveb/spark_client.py:281-292,345-356`.
    */
  def stringToInt(df: DataFrame, cols: Seq[String]): DataFrame =
    df.withColumns(cols.map { c =>
      // guard: 'nan'/'Infinity' parse as non-finite doubles, and Spark
      // casts NaN→0 / Inf→Int.MaxValue — both must be NULL instead.
      c -> expr(s"""try_cast(
        case when isnan(try_cast(`$c` AS double))
               or abs(try_cast(`$c` AS double)) = double('Infinity') then null
             else try_cast(`$c` AS double) end AS int)""")
    }.toMap)

  /** String → timestamp: strip the fractional-seconds tail, parse
    * `yyyy-MM-dd HH:mm:ss`, invalid → NULL.
    * Reference: `udf_string_to_timestamp` `src/pyveb/spark_client.py:294-307,358-371`.
    */
  def stringToTimestamp(df: DataFrame, cols: Seq[String]): DataFrame =
    df.withColumns(cols.map { c =>
      c -> expr(s"try_cast(substring_index(`$c`, '.', 1) AS timestamp_ntz)")
    }.toMap)

  /** Drop non-ASCII characters from string columns (the reference
    * ascii-encodes ignoring errors, `udf_unicode`
    * `src/pyveb/spark_client.py:309-319,373-383`).
    */
  def asciiFold(df: DataFrame, cols: Seq[String]): DataFrame =
    df.withColumns(cols.map { c =>
      c -> regexp_replace(col(c), "[^\\x00-\\x7F]", "")
    }.toMap)
}
