package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Hashes

/** Mergeable distinct-count sketches (HyperLogLog register layout) —
  * the 100 TB answer to `count_distinct` over a key too hot or too wide
  * to shuffle exactly: a corpus collapses to `m = 2^b` integer
  * registers (one small groupBy, map-side combinable), sketches from
  * different days/partitions/tables MERGE by register-wise max (the
  * union-cardinality property exact counts don't have), and the
  * estimate reads 2^b rows, not the corpus.
  *
  * Everything is EXACTLY replayable in another engine, which is rare
  * for sketches and deliberate here: the register math is pure integer
  * arithmetic on the portable 60-bit md5 hash (bucket = low b bits,
  * ρ = lowest-set-bit position of the remaining 60−b bits via a
  * generated integer CASE chain — no `log`/`pow`/bit intrinsics whose
  * libm rounding could differ between engines), and the estimator is
  * one IEEE division of two exactly-summed integers. The estimator is
  * the RAW LogLog/HLL formula `α·m²/Σ2^(−ρ_j)` — production HLL adds
  * low-range bias correction (linear counting) whose `ln` call is
  * exactly the engine-dependent libm op this design excludes; at the
  * cardinalities a sketch exists for (n ≫ m) the raw estimator is the
  * operative branch anyway.
  *
  * Register rows are `(bucket INT, max_rho INT)` with absent buckets
  * meaning register 0 — sketches stay sparse-friendly and a parquet
  * sketch artifact is a few KB regardless of corpus size.
  */
object Sketches {

  /** Default register-index bits: m = 1024 registers, ~3.2% standard
    * error for the corrected estimator class. */
  val DefaultB = 10

  private def bits(b: Int) = 60 - b          // ρ domain: 1..bits, bits+1 when w = 0
  private def maxRho(b: Int) = bits(b) + 1

  /** α_m · m² · 2^maxRho as an exact double literal shared by the
    * Spark plan and any replaying oracle (embed `alphaNumerator(b)`
    * verbatim — double→string→double round-trips exactly). */
  def alphaNumerator(b: Int): Double = {
    val m = (1L << b).toDouble
    // (1L << maxRho).toDouble is exact; Math.pow only promises 1 ulp
    (0.7213 / (1.0 + 1.079 / m)) * m * m * (1L << maxRho(b)).toDouble
  }

  /** Lowest-set-bit position CASE chain over a non-negative integer
    * SQL expression: 1-based, `bits+1` for zero. `divOp` is the
    * integer-division token (Spark `div`, DuckDB `//`) so one
    * generator serves both dialects — keeping the engine and the
    * oracle running literally the same arithmetic. */
  def rhoCaseSql(w: String, nBits: Int, divOp: String): String = {
    val branches = (1 to nBits).map { k =>
      val cond =
        if (k == 1) s"$w % 2 = 1"
        else s"(($w) $divOp ${1L << (k - 1)}) % 2 = 1"
      s"WHEN $cond THEN $k"
    }
    s"CASE ${branches.mkString(" ")} ELSE ${nBits + 1} END"
  }

  /** Register value → scaled term `2^(maxRho − rho)` as a CASE of
    * literals (the exact-integer form of `2^(−ρ)·2^maxRho`). */
  def termCaseSql(rho: String, b: Int): String = {
    val mr = maxRho(b)
    val branches = (1 to mr).map(k => s"WHEN $rho = $k THEN ${1L << (mr - k)}")
    s"CASE ${branches.mkString(" ")} END"
  }

  /** Build the sketch: one row per OCCUPIED register. One shuffle of
    * ≤m groups (map-side combined), whatever the input size. */
  def hllSketch(df: DataFrame, keyCol: String, b: Int = DefaultB): DataFrame = {
    require(b >= 4 && b <= 16, s"hllSketch: b=$b outside [4,16]")
    val h: Column = Hashes.portable(col(keyCol).cast(StringType))
    df.select(
        h.bitwiseAND(lit((1L << b) - 1)).cast(IntegerType).as("bucket"),
        shiftright(h, b).as("__w"))   // h ≥ 0 (60-bit), so >> is the unsigned shift
      .withColumn("__rho", expr(rhoCaseSql("__w", bits(b), "div")))
      .groupBy("bucket")
      .agg(max(col("__rho")).cast(IntegerType).as("max_rho"))
  }

  /** Union cardinality without touching either corpus: register-wise
    * max. Associative + commutative + idempotent, so daily sketches
    * roll up in any order and replays are harmless. */
  def hllMerge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "hllMerge: need at least one sketch")
    sketches.reduce(_.unionByName(_))
      .groupBy("bucket")
      .agg(max(col("max_rho")).cast(IntegerType).as("max_rho"))
  }

  /** Raw estimate from a sketch: `(n_estimate DOUBLE, n_present BIGINT)`
    * in one ≤m-row aggregation. Absent registers enter the sum as
    * `2^maxRho` (ρ = 0). */
  def hllEstimate(sketch: DataFrame, b: Int = DefaultB): DataFrame = {
    val m = 1L << b
    val emptyTerm = 1L << maxRho(b)
    sketch
      .withColumn("__term", expr(termCaseSql("max_rho", b)))
      .agg(count(lit(1)).as("n_present"), sum(col("__term")).as("__sp"))
      .select(
        (lit(alphaNumerator(b)) /
          (col("__sp") + (lit(m) - col("n_present")) * lit(emptyTerm))
            .cast(DoubleType)).as("n_estimate"),
        col("n_present"))
  }
}
