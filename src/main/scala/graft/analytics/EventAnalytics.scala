package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product-analytics operators over event streams — ordered-funnel
  * conversion and cohort retention. Part of the beyond-reference
  * extension tier: the reference moves event tables around but has no
  * sequence analytics; any pipeline feeding a warehouse grows these
  * two questions immediately ("how many users reach step k", "how many
  * of week w's signups are still active n weeks later").
  *
  * Scale design: the funnel computes EVERY step in one shuffle — k
  * chained cumulative-min window columns share a single (user, ts)
  * partitioning+sort, and the per-user collapse rides the window's own
  * partitioning. Retention is two map-side-combinable aggregations and
  * one join on the user key. No collect, no driver loop, no per-step
  * pass over the events.
  */
object EventAnalytics {

  /** Strict ORDERED funnel: a user completes step i at the earliest
    * event of `steps(i)`'s type that happens STRICTLY AFTER their
    * step-(i-1) completion (the classic ordered-funnel semantics:
    * view→click→signup→purchase counts a purchase only when the whole
    * chain precedes it in order). Returns one row per step:
    * `(step, step_name, n_users)` with `step` 1-based; `n_users` is
    * monotonically non-increasing by construction.
    *
    * Implementation: per-row cumulative minimum `r_i` = earliest valid
    * step-i completion at-or-before the row, where "valid" reads the
    * row's own `r_(i-1)` — so all k running minima evaluate over ONE
    * window (same partition key, same (ts, tie) sort: one exchange,
    * one sort, k Window operators pipelined). The final per-user value
    * of a cumulative min is just `min` over the partition, so the
    * collapse is a groupBy on the already-partitioned key. `tieCol`
    * (a unique event id) pins the within-timestamp order so equal
    * timestamps cannot reorder across runs or engines.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             tieCol: String): DataFrame = {
    require(steps.nonEmpty, "funnel: steps must be non-empty")
    require(steps.distinct.size == steps.size,
      s"funnel: duplicate step types in ${steps.mkString(",")} — a repeated " +
        "type makes 'strictly after the previous step' ambiguous")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol).asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var df = events.select(col(userCol), col(tsCol), col(typeCol), col(tieCol))
    steps.zipWithIndex.foreach { case (s, i) =>
      val valid =
        if (i == 0) col(typeCol) === s
        else col(typeCol) === s && col(tsCol) > col(s"__r${i - 1}")
      df = df.withColumn(s"__r$i", min(when(valid, col(tsCol))).over(w))
    }
    val perUser = df.groupBy(col(userCol)).agg(
      min(col("__r0")).as("__t0"),
      steps.indices.tail.map(i => min(col(s"__r$i")).as(s"__t$i")): _*)
    val counts = perUser.agg(
      count(col("__t0")).as("n0"),
      steps.indices.tail.map(i => count(col(s"__t$i")).as(s"n$i")): _*)
    // one row per step from the single aggregated row — stack is the
    // k-literal unpivot, bounded by the step count
    val stackArgs = steps.zipWithIndex
      .map { case (s, i) =>
        // step names come from arbitrary event-type strings — escape
        // them before interpolation into the stack() SQL fragment
        val esc = s.replace("\\", "\\\\").replace("'", "\\'")
        s"${i + 1}, '$esc', n$i"
      }.mkString(", ")
    counts
      .select(expr(s"stack(${steps.size}, $stackArgs) AS (step, step_name, n_users)"))
      .select(col("step").cast(IntegerType), col("step_name"), col("n_users"))
  }

  /** Cohort RETENTION: users are cohorted by the week of their first
    * `cohortType` event, and counted active in week-offset
    * `k = floor((event_date − anchor_date) / 7)` — DAY-granular
    * offsets from each user's own anchor date (an event 6 calendar
    * days after the anchor is offset 0 regardless of time of day; the
    * anchor's sub-day time never shifts a bucket), not calendar-week
    * truncation of the activity, which would split a cohort's day-6
    * activity across two buckets. The only timestamp-precise bound is
    * the pre-anchor cut (`ts >= anchor`). Returns
    * `(cohort_week, week_offset, n_users)` for offsets `0 until weeks`;
    * offset 0 always counts the full cohort (the anchor event itself
    * is in its own window). `cohort_week` is the anchor week's Monday
    * as a date string — a GROUPING label only.
    *
    * Two map-side-combinable aggregations (first-event per user,
    * distinct users per cell) around one join on the user key; AQE
    * broadcasts the per-user anchor side when the user dimension is
    * small next to the events.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                typeCol: String, cohortType: String,
                weeks: Int): DataFrame = {
    require(weeks >= 1, "retention: weeks must be >= 1")
    val anchors = events.where(col(typeCol) === cohortType)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__anchor"))
    events.select(col(userCol), col(tsCol))
      .join(anchors, userCol)
      .withColumn("week_offset",
        floor(datediff(to_date(col(tsCol)), to_date(col("__anchor"))) / 7)
          .cast(IntegerType))
      .where(col(tsCol) >= col("__anchor") && col("week_offset") < weeks)
      .groupBy(
        date_format(date_trunc("week", col("__anchor")), "yyyy-MM-dd")
          .as("cohort_week"),
        col("week_offset"))
      .agg(count_distinct(col(userCol)).as("n_users"))
  }
}
