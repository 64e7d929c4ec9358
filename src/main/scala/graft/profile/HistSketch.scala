package graft.profile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mergeable QUANTILE sketch — the percentile twin of the
  * [[Sketches]] distinct-count family, closing the one asymmetry the
  * sketch tier had: `Extract.groupQuantilesApprox` is per-run only, so
  * a rolling "p95 doc length by day over 90 days" at 100 TB re-scans
  * history every day. This sketch collapses a corpus to a bounded
  * bucket-count histogram (≤ `63·s + 1` rows for `s` sub-buckets per
  * octave), per-day histograms MERGE BY SUM (count addition is the
  * union property), and a quantile reads the ≤1k-row histogram — never
  * the corpus.
  *
  * Deterministic and ENGINE-REPLAYABLE by the same discipline as the
  * HLL design (`Sketches.scala`): bucketization is a generated integer
  * CASE chain over value octaves (floor-log2 via range tests — no
  * `log`/`pow` libm call whose rounding could differ between engines),
  * bucket → boundary is integer arithmetic, and the only floating-point
  * op on the read path is one IEEE multiply in the rank computation
  * (`ceil(p·N)`) — identical bits in any IEEE-754 engine, so a DuckDB
  * oracle replays every output digit. Randomized KLL (what
  * `percentile_approx` uses) can never be replayed this way; the price
  * of determinism is a VALUE-relative error model instead of a
  * rank-relative one.
  *
  * Error contract: buckets are exponential with `s` linear sub-buckets
  * per power of two, so the returned quantile is the true quantile's
  * bucket lower boundary — relative value error ≤ 1/s (6.25% at the
  * default s=16), any distribution, any scale. Rank selection itself
  * is exact (integer cumulative counts).
  *
  * Domain: non-negative integers (lengths, token counts, byte sizes,
  * latencies — the things corpus profiling actually gates on). Values
  * ≤ 0 land in bucket 0 with boundary 0; NULLs are excluded like every
  * aggregate. Doubles must be truncated by the caller (mirror
  * `CAST(TRUNC(x) AS BIGINT)` in any oracle — DuckDB rounds where
  * Spark truncates).
  */
object HistSketch {

  /** Default linear sub-buckets per octave: relative value error
    * ≤ 1/16 = 6.25%, ≤ 1009 buckets over the full long domain. */
  val DefaultSubBuckets = 16

  private def logS(s: Int): Int = {
    require(s >= 1 && s <= 256 && Integer.bitCount(s) == 1,
      s"HistSketch: subBuckets=$s must be a power of two in [1,256]")
    Integer.numberOfTrailingZeros(s)
  }

  /** Value → bucket id as a generated CASE chain (63 octave branches —
    * small enough to stay inside whole-stage codegen; this runs per
    * CORPUS row, so it must not be the 1000-branch literal form).
    * Bucket 0 holds v ≤ 0; octave e (v ∈ [2^e, 2^(e+1))) holds buckets
    * `1 + e·s .. s + e·s`, sub-bucket `((v − 2^e)·s) div 2^e`.
    * Overflow-proof: the multiply form runs only below octave log2(s)
    * (tiny operands); above it the same quantity is the exact division
    * `(v − 2^e) div 2^(e−log2 s)`. `divOp` is the integer-division
    * token (Spark `div`, DuckDB `//`) so one generator serves engine
    * and oracle — both run literally the same arithmetic.
    */
  def bucketCaseSql(v: String, s: Int, divOp: String): String = {
    val ls = logS(s)
    val branches = (0 until 63).map { e =>
      val lo = 1L << e
      val base = 1L + e.toLong * s
      val sub =
        if (e < ls) s"((($v) - $lo) * $s) $divOp $lo"
        else if (e == ls) s"(($v) - $lo)"
        else s"(($v) - $lo) $divOp ${1L << (e - ls)}"
      if (e < 62) s"WHEN $v < ${1L << (e + 1)} THEN $base + ($sub)"
      else s"ELSE $base + ($sub)"
    }
    s"CASE WHEN $v <= 0 THEN 0 ${branches.init.mkString(" ")} ${branches.last} END"
  }

  /** Bucket id → the smallest value the bucket admits (the reported
    * quantile). Integer arithmetic with the power-of-two factors as
    * literal CASE chains on the octave — applied only to ≤1k-row
    * sketch frames, never a corpus. Ceil-form sub-boundary
    * `(j·2^e + s − 1) div s` so the boundary is attainable (floor-form
    * would sit one below the bucket's smallest member in the sub-log2(s)
    * octaves where bucket width < 1).
    */
  def lowerBoundCaseSql(b: String, s: Int, divOp: String): String = {
    val ls = logS(s)
    val e = s"((($b) - 1) $divOp $s)"
    val j = s"((($b) - 1) % $s)"
    val p2 = (0 until 63).map(k => s"WHEN $e = $k THEN ${1L << k}").mkString(" ")
    val step = (0 until 63).map { k =>
      val v =
        if (k < ls) s"(($j * ${1L << k}) + ${s - 1}) $divOp $s"
        else if (k == ls) j
        else s"$j * ${1L << (k - ls)}"
      s"WHEN $e = $k THEN $v"
    }.mkString(" ")
    s"CASE WHEN ($b) <= 0 THEN 0 ELSE (CASE $p2 END) + (CASE $step END) END"
  }

  /** Build the histogram: one row per OCCUPIED bucket, `(bucket INT,
    * cnt BIGINT)`. One map-side-combinable shuffle of ≤ 63·s+1 groups,
    * whatever the input size. */
  def histSketch(df: DataFrame, valCol: String,
                 subBuckets: Int = DefaultSubBuckets): DataFrame = {
    logS(subBuckets)   // validate
    df.where(col(valCol).isNotNull)
      .select(col(valCol).cast(LongType).as("__v"))
      .select(expr(bucketCaseSql("__v", subBuckets, "div"))
        .cast(IntegerType).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Union of histograms = bucket-wise SUM (associative + commutative,
    * so daily tranches roll up in any order — but unlike the HLL
    * register max it is NOT idempotent: replay safety comes from each
    * ingest overwriting its own tranche, and consolidation needs the
    * superseding manifest in [[consolidateHist]]). */
  def histMerge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "histMerge: need at least one sketch")
    sketches.reduce(_.unionByName(_))
      .groupBy("bucket")
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Quantiles from a histogram, `(p DOUBLE, value BIGINT)` per
    * requested p: rank = `max(1, ceil(p·N))` (one IEEE multiply on
    * exactly-summed integer counts — engine-identical), value = lower
    * boundary of the first bucket whose cumulative count reaches the
    * rank. The cumulative window is a GLOBAL order — safe here and
    * only here because the frame is a sketch, bounded at 63·s+1 rows
    * by construction. Input must have unique buckets (the contract of
    * [[histSketch]]/[[histMerge]]/[[readHist]]).
    */
  def histQuantiles(sketch: DataFrame, ps: Seq[Double],
                    subBuckets: Int = DefaultSubBuckets): DataFrame = {
    logS(subBuckets)
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      "histQuantiles: quantiles must be in (0,1]")
    val spark = sketch.sparkSession
    val w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = sketch.agg(sum(col("cnt")).as("__total"))
    val pDf = spark.range(1).select(explode(array(ps.map(lit): _*)).as("p"))
    sketch
      .withColumn("__cum", sum(col("cnt")).over(w))
      .crossJoin(broadcast(total))          // 1-row scalar singleton
      .crossJoin(broadcast(pDf))            // ≤ |ps| rows
      .where(col("__cum") >=
        greatest(lit(1L), ceil(col("p") * col("__total"))))
      .groupBy(col("p"))
      .agg(min(col("bucket")).as("__b"))
      .select(col("p"),
        expr(lowerBoundCaseSql("__b", subBuckets, "div"))
          .cast(LongType).as("value"))
  }

  /** Quantile-BAND assignment from a histogram sketch: label every row
    * with how many of the `ps` quantile thresholds its value reaches —
    * "which band of HISTORY's length distribution is this new doc in"
    * (the curation gate that keeps a stable meaning as the corpus
    * grows, because the thresholds come from the at-rest artifact, not
    * from the batch being scored). `band` ∈ 0..|ps|: 0 = below every
    * threshold, |ps| = at or above all of them; NULL values get a NULL
    * band.
    *
    * The thresholds are a ≤|ps|-row [[histQuantiles]] result collected
    * at plan-build time (the fitted-quantizer precedent) and baked in
    * as literals — scoring is then a pure per-row integer-compare
    * projection, shuffle-free, over ANY batch size. Thresholds are
    * exact longs, so the comparison is bit-deterministic in every
    * engine.
    */
  def histBucketize(df: DataFrame, valCol: String, sketch: DataFrame,
                    ps: Seq[Double],
                    subBuckets: Int = DefaultSubBuckets): DataFrame = {
    val thr = histQuantiles(sketch, ps, subBuckets)
      .collect().map(_.getLong(1)) // bounded: ≤ |ps| rows
    val v = col(valCol).cast(LongType)
    val band = thr.map(t => when(v >= lit(t), 1).otherwise(0)).reduce(_ + _)
    df.withColumn("band",
      when(v.isNull, lit(null)).otherwise(band).cast(IntegerType))
  }

  /** ROLLING per-day quantiles — the quantile twin of
    * `Sketches.hllRollingEstimate`: for every day with data, the
    * trailing-`windowDays` quantiles of `valCol`, by merging per-day
    * HISTOGRAMS (sum) instead of re-touching any row. Returns
    * `(day 'yyyy-MM-dd', p DOUBLE, value BIGINT)`.
    *
    * Scale shape: the corpus collapses to ≤ days × (63·s+1) bucket
    * rows FIRST (one map-side-combinable groupBy — the artifact a real
    * pipeline persists per day); the bounded ≤windowDays explode fans
    * out BUCKET ROWS, not events, so a 90-day p95 series over a year
    * of 100 TB events merges 365 ≤1k-row histograms. The cumulative
    * window is per-day (bounded partition), not global.
    */
  def histRollingQuantiles(df: DataFrame, valCol: String, tsCol: String,
                           windowDays: Int, ps: Seq[Double],
                           subBuckets: Int = DefaultSubBuckets): DataFrame = {
    logS(subBuckets)
    require(windowDays >= 1, "histRollingQuantiles: windowDays must be >= 1")
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      "histRollingQuantiles: quantiles must be in (0,1]")
    val spark = df.sparkSession
    val perDay = df.where(col(valCol).isNotNull)
      .select(to_date(col(tsCol)).as("__d"),
        col(valCol).cast(LongType).as("__v"))
      .select(col("__d"),
        expr(bucketCaseSql("__v", subBuckets, "div")).cast(IntegerType).as("bucket"))
      .groupBy(col("__d"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val days = perDay.select(col("__d").as("day")).distinct()
    val fan = perDay
      .select(col("bucket"), col("cnt"),
        explode(sequence(col("__d"), date_add(col("__d"), windowDays - 1))).as("day"))
      .join(broadcast(days), "day")
      .groupBy(col("day"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
    val totals = fan.groupBy(col("day")).agg(sum(col("cnt")).as("__total"))
    val wDay = Window.partitionBy("day").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pDf = spark.range(1).select(explode(array(ps.map(lit): _*)).as("p"))
    fan
      .withColumn("__cum", sum(col("cnt")).over(wDay))
      .join(totals, "day")                  // ≤ |days| rows, AQE-broadcastable
      .crossJoin(broadcast(pDf))
      .where(col("__cum") >=
        greatest(lit(1L), ceil(col("p") * col("__total"))))
      .groupBy(col("day"), col("p"))
      .agg(min(col("bucket")).as("__b"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("p"),
        expr(lowerBoundCaseSql("__b", subBuckets, "div"))
          .cast(LongType).as("value"))
  }

  // ---- at-rest artifact ------------------------------------------------

  /** AT-REST histogram artifact, tagged-tranche layout like
    * `Sketches.writeSketchTranche`: each ingest overwrites ITS OWN
    * `batch=<tag>` tranche, so a replayed batch (at-least-once
    * delivery, task retry, backfill) converges to one copy. The
    * difference from the HLL artifact is the merge algebra: SUM is not
    * idempotent, so crash-safe CONSOLIDATION needs the superseding-
    * manifest protocol ([[graft.util.SumTranches]]) where register-max
    * needed nothing.
    */
  def writeHistTranche(sketch: DataFrame, dir: String, tag: String): Unit =
    graft.util.SumTranches.write(sketch, dir, tag)

  /** Merge-on-read of the at-rest artifact: one ≤tranches×(63·s+1)-row
    * scan, manifest-aware (a half-finished consolidation can never
    * double-count). */
  def readHist(spark: SparkSession, dir: String): DataFrame =
    graft.util.SumTranches.read(spark, dir, Seq("bucket"), "cnt")

  /** Fold the live tranches into ONE, crash-safe under the sum algebra
    * via the superseding manifest (protocol and crash analysis:
    * [[graft.util.SumTranches.consolidate]]). */
  def consolidateHist(spark: SparkSession, dir: String): Unit =
    graft.util.SumTranches.consolidate(spark, dir, Seq("bucket"), "cnt")
}
