package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Regular-grid resampling over irregular event streams — the
  * gap-filling step between raw events and anything that assumes a
  * dense time axis (rolling features, seasonality models, per-hour
  * dashboards that must show the quiet hours too). The reference
  * engine has no time-series surface; this is extension-tier alongside
  * the event-analytics family.
  */
object TimeSeriesOps {

  /** Resample each key's observations onto a fixed `stepSeconds` grid
    * with last-observation-carried-forward fill.
    *
    * Semantics: bucket = `floor(epoch(ts)/step)·step`; per (key,
    * bucket) the LAST observation wins (latest `tsCol`, ties broken by
    * `tieCol` descending — deterministic under any partitioning); the
    * grid spans each key's own [first, last] observed bucket; empty
    * buckets inherit the most recent earlier value and are flagged
    * `src = 'fill'` (observed buckets `'obs'`).
    *
    * Scale shape: one (key, bucket) window to pick winners, one
    * per-key min/max aggregation (map-side combinable), a
    * `sequence()` explode off that ≤|keys|-row frame, one equi-join
    * back, and one per-key ordered window for the fill — every
    * exchange keys on the series key, nothing is collected, and the
    * grid fan-out is `span/step` rows per key (the caller's knob; a
    * 90-day hourly grid is 2161 rows/key regardless of event volume).
    * Dense-grid blowup is visible in the plan, not discovered OOM:
    * the explode sits above a bounded aggregate.
    *
    * Determinism: values are COPIED, never combined — no float
    * arithmetic exists in this operator, so results are trivially
    * bit-identical across engines; bucket math is exact integer
    * (epoch seconds < 2^53 through one floor-division).
    *
    * Output: `(<keyCol>, bucket_ts: long epoch-seconds, value, src)`.
    */
  def resampleFill(df: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String, tieCol: String,
                   stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"resampleFill: stepSeconds=$stepSeconds must be > 0")
    val step = lit(stepSeconds)
    val obs = df.select(col(keyCol), col(tsCol).as("__ts"), col(tieCol).as("__tie"),
      col(valueCol).as("__v"),
      (floor(unix_timestamp(col(tsCol)) / step) * step).cast(LongType).as("bucket_ts"))
    val lastW = Window.partitionBy(col(keyCol), col("bucket_ts"))
      .orderBy(col("__ts").desc, col("__tie").desc)
    val winners = obs.withColumn("__rn", row_number().over(lastW))
      .where(col("__rn") === 1)
      .select(col(keyCol), col("bucket_ts"), col("__v"))
    val grid = obs.groupBy(col(keyCol))
      .agg(min("bucket_ts").as("__mn"), max("bucket_ts").as("__mx"))
      .select(col(keyCol),
        explode(sequence(col("__mn"), col("__mx"), step)).as("bucket_ts"))
    val fillW = Window.partitionBy(col(keyCol)).orderBy(col("bucket_ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(winners, Seq(keyCol, "bucket_ts"), "left")
      .select(col(keyCol), col("bucket_ts"),
        last(col("__v"), ignoreNulls = true).over(fillW).as("value"),
        when(col("__v").isNull, lit("fill")).otherwise(lit("obs")).as("src"))
  }

  /** Trailing-window rolling aggregates per key: over the `nRows` most
    * recent rows in `orderCol` order (inclusive of the current one),
    * the exact sum, the window row count, and their ratio. Meant to
    * run over [[resampleFill]]'s dense grid, where "last 24 rows" IS
    * "last 24 hours" — on an irregular series a row window is not a
    * time window, which is why this composes with the resampler
    * instead of guessing.
    *
    * Determinism: the windowed sum runs over DECIMAL(12,2)-snapped
    * values — exact, so the within-frame accumulation order (and
    * DuckDB's segment-tree window evaluation vs Spark's running frame)
    * cannot flip a digit; `roll_sum` is the exact decimal cast to
    * double (value-determined, identical everywhere) and `roll_avg` is
    * ONE IEEE division of that by the exact count. The usual
    * exact-decimal-sum oracle discipline, applied inside a window
    * frame.
    *
    * Exclusion semantics (r18 verdict #1 — the AnomalyOps ANSI-
    * overflow sibling): the snap is a `try_cast`, so a NULL value OR a
    * magnitude beyond DECIMAL(12,2) (|v| ≥ 10^10 — a bytes counter, a
    * sensor spike) is EXCLUDED from the frame instead of throwing
    * under ANSI mode (Spark 4's default) and killing the rolling job.
    * `roll_n` counts the SNAPPED column, so n, sum and avg always
    * describe the same observation set (the r16 n/S alignment
    * discipline); rows excluded from a frame still get their own
    * output row, flagged by the smaller `roll_n`. A frame with no
    * snappable rows reports (NULL, 0, NULL).
    *
    * Scale shape: one key-partitioned ordered window — a single
    * exchange + sort, reused for all three outputs. Ties in
    * `orderCol` make the frame CONTENTS order-dependent, so the
    * caller's order column must be unique per key (the resampler's
    * grid is).
    */
  def rollingAgg(df: DataFrame, keyCol: String, orderCol: String,
                 valueCol: String, nRows: Int): DataFrame = {
    require(nRows >= 1, s"rollingAgg: nRows=$nRows must be >= 1")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(-(nRows - 1).toLong, Window.currentRow)
    val snapped = col(valueCol).try_cast(DecimalType(12, 2))
    val exact = sum(snapped).over(w)
    val cnt = count(snapped).over(w)
    df.withColumn("roll_sum", exact.cast(DoubleType))
      .withColumn("roll_n", cnt)
      .withColumn("roll_avg", exact.cast(DoubleType) / cnt)
  }
}
