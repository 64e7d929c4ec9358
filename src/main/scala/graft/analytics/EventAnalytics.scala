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
    *
    * `horizonSecs` bounds the CONVERSION WINDOW: with `Some(h)`, a
    * step-i (i ≥ 1) event only completes the funnel chain when it falls
    * within `h` seconds of the user's step-0 completion ("purchase
    * within 7 days of first view"). The horizon anchors on the EARLIEST
    * step-0 event — the cumulative-min formulation has no funnel
    * re-entry, so a user whose first view expired unconverted does not
    * restart the clock at their next view; that determinism is what
    * keeps the whole funnel one exchange + one sort and lets the oracle
    * replay it. The predicate reads the row's own `__r0` running min,
    * so it stays inside the same shared window — a horizon adds zero
    * shuffles.
    */
  /** Shared chained-cumulative-min core: one row per user with
    * `__t0..__tk` = that user's earliest valid completion timestamp of
    * each step (NULL where the chain broke). One exchange + one sort
    * for all k steps — both [[funnel]] and [[funnelTimes]] ride it.
    */
  private def funnelCompletions(events: DataFrame, userCol: String,
                                tsCol: String, typeCol: String,
                                steps: Seq[String], tieCol: String,
                                horizonSecs: Option[Long]): DataFrame = {
    require(steps.nonEmpty, "funnel: steps must be non-empty")
    require(steps.distinct.size == steps.size,
      s"funnel: duplicate step types in ${steps.mkString(",")} — a repeated " +
        "type makes 'strictly after the previous step' ambiguous")
    require(horizonSecs.forall(_ > 0), "funnel: horizonSecs must be positive")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol).asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var df = events.select(col(userCol), col(tsCol), col(typeCol), col(tieCol))
    steps.zipWithIndex.foreach { case (s, i) =>
      val valid =
        if (i == 0) col(typeCol) === s
        else {
          val chained = col(typeCol) === s && col(tsCol) > col(s"__r${i - 1}")
          horizonSecs match {
            case Some(h) =>
              chained && col(tsCol) <= expr(s"timestampadd(SECOND, $h, __r0)")
            case None => chained
          }
        }
      df = df.withColumn(s"__r$i", min(when(valid, col(tsCol))).over(w))
    }
    df.groupBy(col(userCol)).agg(
      min(col("__r0")).as("__t0"),
      steps.indices.tail.map(i => min(col(s"__r$i")).as(s"__t$i")): _*)
  }

  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             tieCol: String, horizonSecs: Option[Long] = None): DataFrame = {
    val perUser = funnelCompletions(events, userCol, tsCol, typeCol, steps,
      tieCol, horizonSecs)
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

  /** FUNNEL TRANSITION TIMES: for each adjacent step pair, how many
    * users completed the transition and their average time-to-convert —
    * the "where does the funnel stall" companion to [[funnel]]'s "where
    * does it leak". Returns one row per transition:
    * `(step, from_step, to_step, n_users, avg_secs)` with `step` the
    * 1-based index of the DESTINATION step.
    *
    * Same single window + per-user collapse as [[funnel]] (shared
    * [[funnelCompletions]] core — by construction `t_i > t_(i-1)`
    * whenever `t_i` is non-null, so every diff is positive). The
    * average goes through an exact integer-microsecond sum divided out
    * to double at the end, so partition summation order can never
    * change a digit.
    */
  def funnelTimes(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String],
                  tieCol: String, horizonSecs: Option[Long] = None): DataFrame = {
    require(steps.size >= 2, "funnelTimes: need at least 2 steps for a transition")
    val perUser = funnelCompletions(events, userCol, tsCol, typeCol, steps,
      tieCol, horizonSecs)
    // integer-µs transition gaps (session tz is UTC: the NTZ→timestamp
    // cast under unix_micros is wall-clock identity)
    val withDiffs = perUser.select(
      steps.indices.tail.map(i =>
        (unix_micros(col(s"__t$i").cast(TimestampType)) -
          unix_micros(col(s"__t${i - 1}").cast(TimestampType))).as(s"__d$i")): _*)
    val agged = withDiffs.agg(
      count(col("__d1")).as("n1"),
      (steps.indices.tail.map(i => sum(col(s"__d$i")).as(s"s$i")) ++
        steps.indices.drop(2).map(i => count(col(s"__d$i")).as(s"n$i"))): _*)
    val withAvgs = steps.indices.tail.foldLeft(agged) { (df, i) =>
      df.withColumn(s"a$i",
        col(s"s$i").cast(DoubleType) / col(s"n$i") / lit(1000000.0))
    }
    val stackArgs = steps.indices.tail.map { i =>
      def esc(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
      s"${i + 1}, '${esc(steps(i - 1))}', '${esc(steps(i))}', n$i, a$i"
    }.mkString(", ")
    withAvgs.select(expr(
      s"stack(${steps.size - 1}, $stackArgs) AS (step, from_step, to_step, n_users, avg_secs)"))
      .select(col("step").cast(IntegerType), col("from_step"), col("to_step"),
        col("n_users"), col("avg_secs"))
  }

  /** FUNNEL WITH RE-ENTRY — the windowed-restart twin of [[funnel]]
    * with a horizon: where [[funnel]] anchors the conversion clock on
    * the user's FIRST step-0 forever (a user whose first view expired
    * unconverted never restarts), here the user opens a NEW ATTEMPT at
    * their next step-0 after the horizon lapses, and completes step i
    * if ANY attempt converts through step i inside its own window.
    * Returns the same `(step, step_name, n_users)` shape; counts are
    * ≥ [[funnel]]'s with the same horizon by construction.
    *
    * Attempt semantics are the SESSION-WINDOW ones over step-0 events:
    * a step-0 event starts a new attempt when it falls more than
    * `horizonSecs` after the PREVIOUS step-0 event, and the attempt's
    * anchor is that starting event. Chained step-0 events each within
    * the horizon of the one before EXTEND the attempt without moving
    * its anchor — so a view every 23 h under a 24 h horizon is one
    * attempt anchored at the first view, and a purchase 30 h in does
    * NOT convert. That is the deterministic, windowed-recursion-free
    * reading of "restart on expiry" (the literal reading — anchor
    * restarts when `ts > anchor + h` — is a row-recursive scan no
    * window function expresses); it is also exactly what
    * `session_window(step0, h)` would assemble.
    *
    * Plan shape: TWO exchanges instead of [[funnel]]'s one — the
    * (user)-partitioned window derives each row's current attempt
    * anchor (previous-step-0 running max + anchor running max, two
    * frames on one sort), then the (user, anchor)-partitioned window
    * runs the identical chained cumulative-min as [[funnelCompletions]]
    * within each attempt. The per-attempt collapse rides the second
    * window's partitioning, and the per-user OR over attempts is a
    * tiny attempt-level aggregate. Still no self-join, no collect, no
    * per-step pass.
    */
  def funnelReentry(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, steps: Seq[String],
                    tieCol: String, horizonSecs: Long): DataFrame = {
    require(steps.nonEmpty, "funnelReentry: steps must be non-empty")
    require(steps.distinct.size == steps.size,
      s"funnelReentry: duplicate step types in ${steps.mkString(",")}")
    require(horizonSecs > 0, "funnelReentry: horizonSecs must be positive")
    val ord = Window.partitionBy(userCol).orderBy(col(tsCol).asc, col(tieCol).asc)
    val w = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = ord.rowsBetween(Window.unboundedPreceding, -1)
    val is0 = col(typeCol) === steps.head
    var df = events.select(col(userCol), col(tsCol), col(typeCol), col(tieCol))
      .withColumn("__prev0", max(when(is0, col(tsCol))).over(wPrev))
      .withColumn("__na",
        when(is0 && (col("__prev0").isNull ||
            col(tsCol) > expr(s"timestampadd(SECOND, $horizonSecs, __prev0)")),
          col(tsCol)))
      .withColumn("__anchor", max(col("__na")).over(w))
    val wa = Window.partitionBy(col(userCol), col("__anchor"))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inHorizon =
      col(tsCol) <= expr(s"timestampadd(SECOND, $horizonSecs, __anchor)")
    steps.zipWithIndex.foreach { case (s, i) =>
      val valid =
        if (i == 0) col(typeCol) === s && inHorizon
        else col(typeCol) === s && col(tsCol) > col(s"__r${i - 1}") && inHorizon
      df = df.withColumn(s"__r$i", min(when(valid, col(tsCol))).over(wa))
    }
    val perAttempt = df.where(col("__anchor").isNotNull)
      .groupBy(col(userCol), col("__anchor"))
      .agg(min(col("__r0")).as("__t0"),
        steps.indices.tail.map(i => min(col(s"__r$i")).as(s"__t$i")): _*)
    val perUser = perAttempt.groupBy(col(userCol))
      .agg(max(when(col("__t0").isNotNull, 1).otherwise(0)).as("__f0"),
        steps.indices.tail.map(i =>
          max(when(col(s"__t$i").isNotNull, 1).otherwise(0)).as(s"__f$i")): _*)
    val counts = perUser.agg(sum(col("__f0")).as("n0"),
      steps.indices.tail.map(i => sum(col(s"__f$i")).as(s"n$i")): _*)
    val stackArgs = steps.zipWithIndex
      .map { case (s, i) =>
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

  /** LAST-TOUCH ATTRIBUTION: each `conversionType` event is credited to
    * the user's most recent preceding event whose type is in
    * `touchTypes` (strictly preceding in the deterministic `(ts, tie)`
    * order — a touch sharing the conversion's timestamp counts when its
    * tie id is lower, so runs and engines can never disagree on equal
    * timestamps). `lookbackSecs` bounds the credit window ("a view
    * older than 30 days gets no credit"); conversions with no qualifying
    * touch report as `touch_type = 'unattributed'`. Returns
    * `(touch_type, n_conversions)`.
    *
    * One window over the same `(user, ts, tie)` partitioning the funnel
    * uses: two `last(..., ignoreNulls)` running values (touch type +
    * its timestamp — non-null on exactly the same rows, so they always
    * describe the same touch event) and a per-row frame ending at
    * `-1 row`. No join, no per-touch-type pass, one shuffle total.
    */
  def attribution(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, touchTypes: Seq[String],
                  conversionType: String, tieCol: String,
                  lookbackSecs: Option[Long] = None): DataFrame = {
    require(touchTypes.nonEmpty, "attribution: touchTypes must be non-empty")
    require(!touchTypes.contains(conversionType),
      "attribution: the conversion type cannot also be a touch type")
    require(lookbackSecs.forall(_ > 0), "attribution: lookbackSecs must be positive")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol).asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col(typeCol).isin(touchTypes.map(lit): _*)
    val credited = events
      .select(col(userCol), col(tsCol), col(typeCol), col(tieCol))
      .withColumn("__touch_type", last(when(isTouch, col(typeCol)), ignoreNulls = true).over(w))
      .withColumn("__touch_ts", last(when(isTouch, col(tsCol)), ignoreNulls = true).over(w))
      .where(col(typeCol) === conversionType)
    val inWindow = lookbackSecs match {
      case Some(lb) =>
        col("__touch_ts").isNotNull &&
          col(tsCol) <= expr(s"timestampadd(SECOND, $lb, __touch_ts)")
      case None => col("__touch_ts").isNotNull
    }
    credited
      .select(when(inWindow, col("__touch_type")).otherwise(lit("unattributed"))
        .as("touch_type"))
      .groupBy("touch_type")
      .agg(count(lit(1)).as("n_conversions"))
  }

  /** EVENT TRANSITION MATRIX (first-order Markov counts): how often
    * each event type is immediately followed by each other type within
    * a user's stream — the empirical input to funnel DISCOVERY (which
    * step orderings actually happen) where [[funnel]] measures a
    * hypothesized one. Returns `(from_type, to_type, n_transitions)`.
    *
    * One `lag` over the shared deterministic `(user, ts, tie)` window
    * (the same single exchange+sort every operator in this file
    * rides), then a map-side-combinable pair count. Stream boundaries
    * (each user's first event) have no predecessor and count nothing.
    */
  def eventTransitions(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol).asc, col(tieCol).asc)
    events
      .select(col(userCol), col(tsCol), col(typeCol), col(tieCol))
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .where(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** ROLLING ACTIVE USERS: for every calendar day with any activity,
    * the distinct-user count over the trailing `windowDays` days — the
    * DAU/WAU/MAU dashboard series (`windowDays` 1/7/30). Returns
    * `(day, n_users)` with `day` a `yyyy-MM-dd` label.
    *
    * Scale shape: collapse to distinct `(user, day)` first (one
    * map-side-combinable agg that shrinks events to at most
    * users × days rows), then explode each pair into the ≤`windowDays`
    * future days it keeps its user active in — a bounded fan-out of the
    * ALREADY-collapsed set, not of the raw events — and count distinct
    * users per day. The day dimension is tiny, so the days-with-activity
    * filter join broadcasts. No global-order window, no range self-join
    * (a range join on days would rescan the activity set per day;
    * the bounded explode ships each pair exactly `windowDays` times).
    */
  def rollingActiveUsers(events: DataFrame, userCol: String, tsCol: String,
                         windowDays: Int): DataFrame = {
    require(windowDays >= 1, "rollingActiveUsers: windowDays must be >= 1")
    val activity = events
      .select(col(userCol).as("__user"), to_date(col(tsCol)).as("__d"))
      .distinct()
    val days = activity.select(col("__d").as("day")).distinct()
    activity
      .select(col("__user"),
        explode(sequence(col("__d"),
          date_add(col("__d"), windowDays - 1))).as("day"))
      .join(broadcast(days), "day")
      .groupBy(date_format(col("day"), "yyyy-MM-dd").as("day"))
      .agg(count_distinct(col("__user")).as("n_users"))
  }

  /** Top-k frequent event PATHS: the most common length-`len`
    * consecutive event-type sequences across all users' ordered
    * streams — "what do people actually do in order" (the lightweight
    * sequential-pattern answer behind navigation analysis and
    * funnel-candidate discovery; the transition matrix is its len=2
    * marginal).
    *
    * A path occurrence = `len` CONSECUTIVE events of one user in
    * `(tsCol, tieCol)` order (strictly consecutive, not subsequence —
    * gaps break a path, which is what makes counts interpretable as
    * journeys). Plan: one (user, ts, tie) window provides `len−1`
    * `lead` columns (a single exchange + sort), paths concatenate with
    * `>`, then one map-side-combinable count and a TopK rank window.
    * Ranks tie-break by path string — fully deterministic.
    *
    * Output: `(path, n_occurrences, rank)`, rank ≤ k.
    */
  def frequentPaths(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, tieCol: String,
                    len: Int = 3, k: Int = 20): DataFrame = {
    require(len >= 2, s"frequentPaths: len=$len must be >= 2")
    require(k >= 1, s"frequentPaths: k=$k must be >= 1")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val leads = (1 until len).map(i => lead(col(typeCol), i).over(w))
    val path = concat_ws(">", (col(typeCol) +: leads): _*)
    val complete = leads.map(_.isNotNull).reduce(_ && _)
    events
      .select(path.as("path"), complete.as("__ok"))
      .where(col("__ok"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_occurrences"))
      // global-order window, deliberately: its input is the PATH
      // VOCABULARY (≤ |event types|^len rows — 5³ here, never
      // data-sized), the one case where a single-task rank is cheaper
      // than any distributed alternative
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_occurrences").desc, col("path"))))
      .where(col("rank") <= k)
  }
}
