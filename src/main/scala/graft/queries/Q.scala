package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark plan + (optionally) the ANSI SQL
  * a DuckDB oracle runs over the same parquet tables. Column names and
  * value semantics must match exactly (the driver sorts columns by name
  * and hash-compares values) — so every computed column is aliased
  * identically on both sides, and double aggregates are computed through
  * exact DECIMAL sums cast back to DOUBLE so floating-point summation
  * order can never flip a digit between engines.
  *
  * `oracle` is a thunk so the SQL can be GENERATED from state the query
  * run itself produced — the approximate-ANN oracles embed the fitted
  * quantizer literals (centroids/codebooks), which exist only after the
  * corresponding query has fit them. `Verify` dumps `oracle_sql.json`
  * after running every query, so generation-time state is always there
  * on the driver path; a generator may still return None (→ the driver
  * records the weaker rows-only check) when its inputs are absent.
  */
final case class Q(name: String,
                   fn: (SparkSession, String) => DataFrame,
                   oracle: () => Option[String])

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, () => Some(oracle))
  /** Oracle generated at dump time (e.g. from fitted-quantizer caches). */
  def dynamic(name: String)(oracle: => Option[String])(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, () => oracle)
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, () => None)
}
