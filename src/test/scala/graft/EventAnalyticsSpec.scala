package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.analytics.EventAnalytics

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(rows: (String, String, String, Long)*): DataFrame =
    rows.toSeq.map { case (u, t, typ, id) => (u, ts(t), typ, id) }
      .toDF("user_id", "ts", "event_type", "event_id")

  private val STEPS = Seq("view", "click", "buy")

  private def funnelCounts(df: DataFrame): Map[String, Long] =
    EventAnalytics.funnel(df, "user_id", "ts", "event_type", STEPS, "event_id")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap

  test("funnel counts only in-order completions") {
    // u1 completes the whole chain in order; u2 clicks BEFORE viewing and
    // never clicks again — ordered semantics credit u2 with view only.
    val df = ev(
      ("u1", "2024-01-01 10:00:00", "view", 1),
      ("u1", "2024-01-01 10:01:00", "click", 2),
      ("u1", "2024-01-01 10:02:00", "buy", 3),
      ("u2", "2024-01-01 09:00:00", "click", 4),
      ("u2", "2024-01-01 09:30:00", "view", 5),
      ("u2", "2024-01-01 09:45:00", "buy", 6))
    assert(funnelCounts(df) == Map("view" -> 2L, "click" -> 1L, "buy" -> 1L))
  }

  test("funnel requires strictly-later timestamps between steps") {
    // click at the SAME instant as the view does not advance the chain
    // (ts > r0 is strict), but a later click does.
    val same = ev(
      ("u1", "2024-01-01 10:00:00", "view", 1),
      ("u1", "2024-01-01 10:00:00", "click", 2))
    assert(funnelCounts(same) == Map("view" -> 1L, "click" -> 0L, "buy" -> 0L))
    val later = ev(
      ("u1", "2024-01-01 10:00:00", "view", 1),
      ("u1", "2024-01-01 10:00:01", "click", 2))
    assert(funnelCounts(later) == Map("view" -> 1L, "click" -> 1L, "buy" -> 0L))
  }

  test("funnel uses earliest valid completion, not latest") {
    // u1 views at 10:00 and 12:00; a click at 11:00 follows the FIRST
    // view, so the chain completes even though it precedes the second.
    val df = ev(
      ("u1", "2024-01-01 10:00:00", "view", 1),
      ("u1", "2024-01-01 11:00:00", "click", 2),
      ("u1", "2024-01-01 12:00:00", "view", 3))
    assert(funnelCounts(df) == Map("view" -> 1L, "click" -> 1L, "buy" -> 0L))
  }

  test("funnel step counts are monotonically non-increasing") {
    val df = ev(
      ("u1", "2024-01-01 10:00:00", "view", 1),
      ("u2", "2024-01-01 10:00:00", "view", 2),
      ("u2", "2024-01-01 10:05:00", "click", 3),
      ("u3", "2024-01-01 10:00:00", "buy", 4))
    val rows = EventAnalytics
      .funnel(df, "user_id", "ts", "event_type", STEPS, "event_id")
      .orderBy("step").collect().map(_.getLong(2))
    assert(rows.toSeq == Seq(2L, 1L, 0L))
    assert(rows.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("funnel step names with quotes/backslashes survive the unpivot") {
    val df = ev(
      ("u1", "2024-01-01 10:00:00", "add'l \\view", 1),
      ("u1", "2024-01-01 10:01:00", "click", 2))
    val rows = EventAnalytics
      .funnel(df, "user_id", "ts", "event_type",
        Seq("add'l \\view", "click"), "event_id")
      .orderBy("step").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("add'l \\view", "click"))
    assert(rows.map(_.getLong(2)).toSeq == Seq(1L, 1L))
  }

  test("funnel rejects duplicate step types") {
    val df = ev(("u1", "2024-01-01 10:00:00", "view", 1))
    val e = intercept[IllegalArgumentException] {
      EventAnalytics.funnel(df, "user_id", "ts", "event_type",
        Seq("view", "click", "view"), "event_id")
    }
    assert(e.getMessage.contains("duplicate step"))
  }

  private def retCells(df: DataFrame, weeks: Int = 4): Map[(String, Int), Long] =
    EventAnalytics.retention(df, "user_id", "ts", "event_type",
      cohortType = "signup", weeks = weeks)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap

  test("retention offsets are anchor-relative, not calendar-truncated") {
    // Anchor Wed 2024-01-03; day+6 (Tue) is still offset 0, day+7 is
    // offset 1 — calendar-week truncation would have split at Monday.
    val df = ev(
      ("u1", "2024-01-03 12:00:00", "signup", 1),
      ("u1", "2024-01-09 08:00:00", "view", 2),   // +6 days → offset 0
      ("u1", "2024-01-10 08:00:00", "view", 3))   // +7 days → offset 1
    // cohort week of Wed 2024-01-03 is Monday 2024-01-01
    assert(retCells(df) == Map(
      ("2024-01-01", 0) -> 1L,
      ("2024-01-01", 1) -> 1L))
  }

  test("retention excludes pre-anchor activity and non-cohort users") {
    val df = ev(
      ("u1", "2024-01-01 10:00:00", "view", 1),   // before anchor: dropped
      ("u1", "2024-01-08 10:00:00", "signup", 2),
      ("u2", "2024-01-08 11:00:00", "view", 3))   // never signs up: dropped
    assert(retCells(df) == Map(("2024-01-08", 0) -> 1L))
  }

  test("retention caps at the weeks horizon and counts distinct users") {
    val df = ev(
      ("u1", "2024-01-01 09:00:00", "signup", 1),
      ("u1", "2024-01-01 10:00:00", "view", 2),   // same cell as anchor
      ("u1", "2024-01-01 11:00:00", "view", 3),   // still one distinct user
      ("u1", "2024-01-30 10:00:00", "view", 4))   // +29d → offset 4 ≥ weeks: cut
    assert(retCells(df, weeks = 4) == Map(("2024-01-01", 0) -> 1L))
  }

  // ---- conversion-window (horizon) funnel ----

  test("funnel horizon cuts steps outside the window, anchored on first view") {
    // u1 buys 2 days after first view: inside a 3-day horizon.
    // u2 clicks inside but buys 4 days after their first view: buy cut.
    // u3's only view expires unconverted; the later view does NOT
    // restart the clock (no re-entry): their click stays uncredited.
    val df = ev(
      ("u1", "2024-01-01 10:00:00", "view", 1),
      ("u1", "2024-01-02 10:00:00", "click", 2),
      ("u1", "2024-01-03 09:00:00", "buy", 3),
      ("u2", "2024-01-01 10:00:00", "view", 4),
      ("u2", "2024-01-02 10:00:00", "click", 5),
      ("u2", "2024-01-05 11:00:00", "buy", 6),
      ("u3", "2024-01-01 10:00:00", "view", 7),
      ("u3", "2024-01-10 10:00:00", "view", 8),
      ("u3", "2024-01-10 10:05:00", "click", 9))
    val got = EventAnalytics.funnel(df, "user_id", "ts", "event_type", STEPS,
      "event_id", horizonSecs = Some(3L * 86400))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got == Map("view" -> 3L, "click" -> 2L, "buy" -> 1L))
  }

  test("funnel horizon boundary is inclusive") {
    val df = ev(
      ("u1", "2024-01-01 10:00:00", "view", 1),
      ("u1", "2024-01-01 10:01:00", "click", 2))  // exactly +60s
    def at(h: Long) = EventAnalytics.funnel(df, "user_id", "ts", "event_type",
      STEPS, "event_id", horizonSecs = Some(h))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(at(60L)("click") == 1L)   // ts <= r0 + horizon: inclusive
    assert(at(59L)("click") == 0L)
  }

  // ---- funnel with re-entry ----

  private def reentryCounts(df: DataFrame, h: Long): Map[String, Long] =
    EventAnalytics.funnelReentry(df, "user_id", "ts", "event_type", STEPS,
      "event_id", horizonSecs = h)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap

  test("funnelReentry: an expired attempt restarts at the next view") {
    // u3 from the no-re-entry horizon test: first view expires
    // unconverted, second view (9 days later, > horizon after the
    // first) opens attempt 2, whose click now counts.
    val df = ev(
      ("u3", "2024-01-01 10:00:00", "view", 7),
      ("u3", "2024-01-10 10:00:00", "view", 8),
      ("u3", "2024-01-10 10:05:00", "click", 9))
    val h = 3L * 86400
    val noReentry = EventAnalytics.funnel(df, "user_id", "ts", "event_type",
      STEPS, "event_id", horizonSecs = Some(h))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(noReentry == Map("view" -> 1L, "click" -> 0L, "buy" -> 0L))
    assert(reentryCounts(df, h) == Map("view" -> 1L, "click" -> 1L, "buy" -> 0L))
  }

  test("funnelReentry: any attempt converting credits the user once") {
    // attempt 1 (day 1) reaches click and expires; attempt 2 (day 10)
    // converts the full chain — the user counts once per step, and a
    // user with two fully-converting attempts still counts once.
    val df = ev(
      ("a", "2024-01-01 10:00:00", "view", 1),
      ("a", "2024-01-01 11:00:00", "click", 2),
      ("a", "2024-01-10 10:00:00", "view", 3),
      ("a", "2024-01-10 11:00:00", "click", 4),
      ("a", "2024-01-10 12:00:00", "buy", 5),
      ("b", "2024-01-01 10:00:00", "view", 6),
      ("b", "2024-01-01 10:30:00", "click", 7),
      ("b", "2024-01-01 11:00:00", "buy", 8),
      ("b", "2024-01-20 10:00:00", "view", 9),
      ("b", "2024-01-20 10:30:00", "click", 10),
      ("b", "2024-01-20 11:00:00", "buy", 11))
    assert(reentryCounts(df, 86400L) ==
      Map("view" -> 2L, "click" -> 2L, "buy" -> 2L))
  }

  test("funnelReentry: chained views extend the attempt without moving its anchor") {
    // session-window semantics: views every 20h under a 24h horizon
    // stay ONE attempt anchored at the first view, so a buy 30h after
    // the anchor does not convert even though it is within 24h of the
    // last view; the chain also never restarts (no view is > h after
    // the previous one).
    val df = ev(
      ("c", "2024-01-01 00:00:00", "view", 1),
      ("c", "2024-01-01 20:00:00", "view", 2),
      ("c", "2024-01-02 16:00:00", "view", 3),
      ("c", "2024-01-02 05:00:00", "click", 4),   // +29h > 24h horizon
      ("c", "2024-01-02 06:00:00", "buy", 5))
    assert(reentryCounts(df, 86400L) ==
      Map("view" -> 1L, "click" -> 0L, "buy" -> 0L))
    // same shape with the click INSIDE the anchor window converts
    val df2 = ev(
      ("c", "2024-01-01 00:00:00", "view", 1),
      ("c", "2024-01-01 20:00:00", "view", 2),
      ("c", "2024-01-01 22:00:00", "click", 3),
      ("c", "2024-01-01 23:00:00", "buy", 4))
    assert(reentryCounts(df2, 86400L) ==
      Map("view" -> 1L, "click" -> 1L, "buy" -> 1L))
  }

  test("funnelReentry: counts are monotone and never below the no-re-entry funnel") {
    // randomized-ish mixed corpus: every step count must dominate the
    // no-re-entry horizon funnel and stay monotone across steps
    val rows = (1 to 40).flatMap { u =>
      val base = ts("2024-01-01 00:00:00").getTime
      (0 until 12).map { k =>
        val t = new Timestamp(base + (u * 7 + k * 13) % 29 * 86400000L + k * 3600000L)
        val typ = Seq("view", "click", "buy", "other")((u * 3 + k) % 4)
        (s"u$u", t, typ, (u * 100 + k).toLong)
      }
    }
    val df = rows.toDF("user_id", "ts", "event_type", "event_id")
    val h = 2L * 86400
    val re = reentryCounts(df, h)
    val no = EventAnalytics.funnel(df, "user_id", "ts", "event_type", STEPS,
      "event_id", horizonSecs = Some(h))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    STEPS.foreach(s => assert(re(s) >= no(s), s"step $s: ${re(s)} < ${no(s)}"))
    assert(re("view") >= re("click") && re("click") >= re("buy"))
  }

  // ---- funnel transition times ----

  test("funnelTimes averages per-transition gaps over completing users only") {
    // u1: view→click 60s, click→buy 120s. u2: view→click 180s, no buy.
    val df = ev(
      ("u1", "2024-01-01 10:00:00", "view", 1),
      ("u1", "2024-01-01 10:01:00", "click", 2),
      ("u1", "2024-01-01 10:03:00", "buy", 3),
      ("u2", "2024-01-01 09:00:00", "view", 4),
      ("u2", "2024-01-01 09:03:00", "click", 5))
    val rows = EventAnalytics.funnelTimes(df, "user_id", "ts", "event_type",
      STEPS, "event_id").orderBy("step").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((2, "view", "click"), (3, "click", "buy")))
    assert(rows(0).getLong(3) == 2L && math.abs(rows(0).getDouble(4) - 120.0) < 1e-9)
    assert(rows(1).getLong(3) == 1L && math.abs(rows(1).getDouble(4) - 120.0) < 1e-9)
  }

  test("funnelTimes reports NULL average for a transition nobody completes") {
    val df = ev(("u1", "2024-01-01 10:00:00", "view", 1))
    val rows = EventAnalytics.funnelTimes(df, "user_id", "ts", "event_type",
      STEPS, "event_id").orderBy("step").collect()
    assert(rows.forall(_.getLong(3) == 0L))
    assert(rows.forall(_.isNullAt(4)))
  }

  // ---- last-touch attribution ----

  private def attr(df: DataFrame, lookback: Option[Long] = None): Map[String, Long] =
    EventAnalytics.attribution(df, "user_id", "ts", "event_type",
      touchTypes = Seq("view", "click"), conversionType = "buy",
      tieCol = "event_id", lookbackSecs = lookback)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("attribution credits the most recent preceding touch") {
    val df = ev(
      ("u1", "2024-01-01 10:00:00", "view", 1),
      ("u1", "2024-01-01 10:05:00", "click", 2),
      ("u1", "2024-01-01 10:10:00", "buy", 3),    // last touch: click
      ("u2", "2024-01-01 09:00:00", "click", 4),
      ("u2", "2024-01-01 09:30:00", "view", 5),
      ("u2", "2024-01-01 09:45:00", "buy", 6),    // last touch: view
      ("u3", "2024-01-01 09:00:00", "buy", 7))    // no touch at all
    assert(attr(df) == Map("click" -> 1L, "view" -> 1L, "unattributed" -> 1L))
  }

  test("attribution lookback expires old touches") {
    val df = ev(
      ("u1", "2024-01-01 10:00:00", "view", 1),
      ("u1", "2024-01-20 10:00:00", "buy", 2))    // 19 days later
    assert(attr(df, lookback = Some(30L * 86400)) == Map("view" -> 1L))
    assert(attr(df, lookback = Some(7L * 86400)) == Map("unattributed" -> 1L))
  }

  test("attribution breaks equal timestamps by the tie column") {
    // touch shares the conversion's timestamp; its tie id is LOWER, so
    // it sorts strictly before the conversion and gets the credit
    val df = ev(
      ("u1", "2024-01-01 10:00:00", "click", 1),
      ("u1", "2024-01-01 10:00:00", "buy", 2))
    assert(attr(df) == Map("click" -> 1L))
    // with the tie order reversed the touch sorts after: no credit
    val rev = ev(
      ("u1", "2024-01-01 10:00:00", "click", 9),
      ("u1", "2024-01-01 10:00:00", "buy", 2))
    assert(attr(rev) == Map("unattributed" -> 1L))
  }

  test("attribution rejects a conversion type that is also a touch") {
    val df = ev(("u1", "2024-01-01 10:00:00", "view", 1))
    val e = intercept[IllegalArgumentException] {
      EventAnalytics.attribution(df, "user_id", "ts", "event_type",
        touchTypes = Seq("view", "buy"), conversionType = "buy", tieCol = "event_id")
    }
    assert(e.getMessage.contains("conversion type"))
  }

  // ---- event transitions ----

  test("eventTransitions counts adjacent pairs per user, tie-ordered") {
    val df = ev(
      ("u1", "2024-01-01 10:00:00", "view", 1),
      ("u1", "2024-01-01 10:01:00", "click", 2),
      ("u1", "2024-01-01 10:02:00", "view", 3),
      ("u1", "2024-01-01 10:03:00", "click", 4),
      // u2's equal-timestamp pair orders by event_id: view(5) → click(6)
      ("u2", "2024-01-01 09:00:00", "view", 5),
      ("u2", "2024-01-01 09:00:00", "click", 6))
    val got = EventAnalytics.eventTransitions(df, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("view", "click") -> 3L,   // u1 twice + u2 once
      ("click", "view") -> 1L))  // never crosses users
  }

  test("eventTransitions emits nothing for single-event users") {
    val df = ev(("u1", "2024-01-01 10:00:00", "view", 1))
    assert(EventAnalytics.eventTransitions(df, "user_id", "ts", "event_type", "event_id")
      .count() == 0L)
  }

  // ---- rolling active users ----

  test("rollingActiveUsers counts trailing-window distinct users per active day") {
    val df = ev(
      ("u1", "2024-01-01 10:00:00", "view", 1),
      ("u2", "2024-01-01 11:00:00", "view", 2),
      ("u1", "2024-01-03 10:00:00", "view", 3),
      ("u3", "2024-01-09 10:00:00", "view", 4))
    val got = EventAnalytics.rollingActiveUsers(df, "user_id", "ts", windowDays = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // active days only: 01 (u1,u2), 03 (u1 new + u1,u2 from 01), 09 (u3)
    assert(got == Map(
      "2024-01-01" -> 2L,   // u1, u2
      "2024-01-03" -> 2L,   // u1 (both days), u2 from 01 (within 3 days)
      "2024-01-09" -> 1L))  // u3 alone; nothing from the gap carries in
  }

  test("rollingActiveUsers dedups multiple same-day events per user") {
    val df = ev(
      ("u1", "2024-01-01 10:00:00", "view", 1),
      ("u1", "2024-01-01 12:00:00", "view", 2),
      ("u1", "2024-01-01 14:00:00", "view", 3))
    val got = EventAnalytics.rollingActiveUsers(df, "user_id", "ts", windowDays = 7)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("2024-01-01" -> 1L))
  }

  test("frequentPaths: consecutive trigrams per user, gaps break paths, tie ranks by path") {
    val df = ev(
      ("u1", "2024-01-01 10:00:00", "view", 1),
      ("u1", "2024-01-01 10:01:00", "click", 2),
      ("u1", "2024-01-01 10:02:00", "buy", 3),
      ("u1", "2024-01-01 10:03:00", "view", 4),
      ("u2", "2024-01-01 11:00:00", "view", 5),
      ("u2", "2024-01-01 11:01:00", "click", 6),
      ("u2", "2024-01-01 11:02:00", "buy", 7))
    val out = EventAnalytics.frequentPaths(df, "user_id", "ts", "event_type",
      "event_id", len = 3, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // u1 contributes view>click>buy AND click>buy>view; u2 only the first
    assert(out.toSeq == Seq(("view>click>buy", 2L, 1), ("click>buy>view", 1L, 2)))
    // paths never cross users: u2's stream ends at buy, no buy>view from u2
    val bigrams = EventAnalytics.frequentPaths(df, "user_id", "ts", "event_type",
      "event_id", len = 2, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bigrams == Map("view>click" -> 2L, "click>buy" -> 2L, "buy>view" -> 1L))
  }

  test("frequentPaths: same-timestamp events order by the tie column; k caps output") {
    val df = ev(
      ("u1", "2024-01-01 10:00:00", "b", 2),
      ("u1", "2024-01-01 10:00:00", "a", 1),
      ("u1", "2024-01-01 10:00:00", "c", 3))
    val out = EventAnalytics.frequentPaths(df, "user_id", "ts", "event_type",
      "event_id", len = 3, k = 1).collect()
    assert(out.length == 1 && out(0).getString(0) == "a>b>c")
  }
}
