package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark plan + (optionally) the ANSI SQL
  * a DuckDB oracle runs over the same parquet tables. Column names and
  * value semantics must match exactly (the driver sorts columns by name
  * and hash-compares values) — so every computed column is aliased
  * identically on both sides, and double aggregates are computed through
  * exact DECIMAL sums cast back to DOUBLE so floating-point summation
  * order can never flip a digit between engines.
  */
final case class Q(name: String,
                   fn: (SparkSession, String) => DataFrame,
                   oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
