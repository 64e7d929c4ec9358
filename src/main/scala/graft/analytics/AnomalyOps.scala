package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Statistical outlier flagging over grouped measures — the triage gate
  * between raw event/metric streams and alerting ("which readings sit
  * more than k sigma from their group's mean"). Extension tier: the
  * reference has no statistical surface.
  */
object AnomalyOps {

  /** Flag rows whose value deviates more than `k` standard deviations
    * from their group's mean — WITHOUT ever computing a mean, a
    * variance, or a square root in floating point.
    *
    * The k-sigma test `|x − S/n| > k·√((Q/n) − (S/n)²)` multiplied
    * through by `n²` becomes
    * {{{
    *   (n·x − S)² > k²·(n·Q − S²)
    * }}}
    * with `S = Σx`, `Q = Σx²` over the group — every operand an exact
    * integer once values are snapped to `decimals` fixed-point digits.
    * No division, no sqrt, no float at all: the comparison is exact
    * integer arithmetic (DECIMAL(38,0) here, HUGEINT in the oracle),
    * bit-identical across engines and immune to summation order. The
    * one approximation is the input snap (DECIMAL(18, decimals) cast —
    * the same exact-decimal discipline every oracle-parity sum in this
    * repo uses).
    *
    * Magnitude budget (why 38 digits are enough): with |value| ≤ 10^v
    * and group size ≤ 10^c rows, both `(n·x − S)²` and `k²·(n·Q − S²)`
    * stay under 10^(2(c+v+decimals)+2) — at v=4, c=9, decimals=4 that
    * is 10^36 < 38 digits: values to ±10^4 in billion-row groups fit.
    * Outside the envelope Spark's non-ANSI decimal overflow turns the
    * comparison NULL (flag null, never silently wrong) — shrink
    * `decimals` to buy headroom; the envelope is a documented contract,
    * checked by the spec at its edges rather than a per-row runtime
    * guard the hot loop would pay for.
    *
    * Shuffle plan: one map-side-combinable groupBy over the group key
    * (three integer aggregates) + one broadcast-or-hash join of the
    * ≤|groups|-row stats frame back onto the rows. Two passes over the
    * data, nothing collected.
    *
    * Output: input columns + `(n_group: long, is_anomaly: boolean)`.
    * Groups with n < 2 flag nothing (variance undefined — both sides
    * are 0 and the strict inequality fails).
    */
  def sigmaFlags(df: DataFrame, keyCol: String, valueCol: String,
                 k: Int = 3, decimals: Int = 4): DataFrame = {
    require(k >= 1, s"sigmaFlags: k=$k must be >= 1")
    require(decimals >= 0 && decimals <= 6,
      s"sigmaFlags: decimals=$decimals outside [0, 6]")
    val unit = math.pow(10, decimals).toLong // exact: decimals <= 6
    val d38 = DecimalType(38, 0)
    val u = (col(valueCol).cast(DecimalType(18, decimals)) * lit(unit))
      .cast(LongType)
    val rows = df.withColumn("__u", u)
    val stats = rows.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"),
        sum(col("__u")).as("__s"),
        sum(col("__u").cast(d38) * col("__u")).as("__q"))
    val n38 = col("__n").cast(d38)
    val s38 = col("__s").cast(d38)
    val dev = n38 * col("__u").cast(d38) - s38
    val rhs = lit(k.toLong * k) * (n38 * col("__q") - s38 * s38)
    rows.join(stats, keyCol)
      .withColumn("n_group", col("__n"))
      .withColumn("is_anomaly", dev * dev > rhs)
      .drop("__u", "__n", "__s", "__q")
  }
}
