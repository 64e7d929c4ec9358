package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Experiment (A/B) analysis over event-derived unit tables — the
  * decision gate between "the metric moved" and "ship it". Extension
  * tier: the reference moves event data; any warehouse it feeds grows
  * an experiment readout next.
  */
object ExperimentOps {

  /** Two-proportion z-test per experiment group, with ZERO floating
    * point: arm A's conversion rate differs significantly from arm B's
    * at the `z` threshold iff
    * {{{
    *   (c_A·n_B − c_B·n_A)² · N  >  z²·C·(N−C)·n_A·n_B
    * }}}
    * — the pooled two-proportion z-test `|p_A−p_B| > z·√(p̂(1−p̂)(1/n_A+1/n_B))`
    * multiplied through by `(n_A·n_B)²·N` (N = n_A+n_B, C = c_A+c_B,
    * p̂ = C/N), every operand an exact integer. No rates, no square
    * roots, no float: the verdict is DECIMAL(38,0) integer arithmetic,
    * bit-identical across engines, partitionings, and replays —
    * the same discipline as [[AnomalyOps.sigmaFlags]].
    *
    * Magnitude budget: with per-arm sizes ≤ 10^6 units the largest
    * product is `z²·C·(N−C)·n_A·n_B` ≈ z²·10^25 — inside 38 digits
    * through z=10. Beyond ~10^6-unit arms, Spark's non-ANSI decimal
    * overflow turns the verdict NULL (never silently wrong); shard the
    * readout by segment first (which a 10^7-unit experiment wants
    * anyway).
    *
    * Input: one row per experimental UNIT —
    * `(groupCol, armCol ∈ {armA, armB}, successCol boolean-ish)`.
    * Units in other arms are ignored. Plan: one map-side-combinable
    * (group, arm) count pass, then a ≤|groups|-row projection — the
    * corpus is touched once.
    *
    * Output: `(group, n_a, conv_a, n_b, conv_b, significant)`; groups
    * missing either arm report `significant = false` (no evidence, not
    * a verdict).
    */
  def twoProportionTest(df: DataFrame, groupCol: String, armCol: String,
                        successCol: String, armA: String = "a",
                        armB: String = "b", z: Int = 2): DataFrame = {
    require(z >= 1, s"twoProportionTest: z=$z must be >= 1")
    require(armA != armB, "twoProportionTest: armA == armB")
    val d38 = DecimalType(38, 0)
    val counts = df
      .where(col(armCol).isin(armA, armB))
      .groupBy(col(groupCol))
      .agg(
        sum(when(col(armCol) === armA, 1L).otherwise(0L)).as("n_a"),
        sum(when(col(armCol) === armA && col(successCol).cast("boolean"), 1L)
          .otherwise(0L)).as("conv_a"),
        sum(when(col(armCol) === armB, 1L).otherwise(0L)).as("n_b"),
        sum(when(col(armCol) === armB && col(successCol).cast("boolean"), 1L)
          .otherwise(0L)).as("conv_b"))
    val nA = col("n_a").cast(d38); val cA = col("conv_a").cast(d38)
    val nB = col("n_b").cast(d38); val cB = col("conv_b").cast(d38)
    val bigN = nA + nB
    val bigC = cA + cB
    val dev = cA * nB - cB * nA
    val lhs = dev * dev * bigN
    val rhs = lit(z.toLong * z) * bigC * (bigN - bigC) * nA * nB
    counts.select(col(groupCol), col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      when(col("n_a") > 0 && col("n_b") > 0, lhs > rhs)
        .otherwise(lit(false)).as("significant"))
  }
}
