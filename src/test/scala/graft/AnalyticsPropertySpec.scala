package graft

import java.sql.Timestamp
import java.time.{Instant, LocalDate, ZoneOffset}

import scala.collection.mutable

import org.apache.spark.sql.DataFrame

import graft.analytics.{EventAnalytics, TimeSeriesOps}

/** Randomized DIFFERENTIAL tests for the event-analytics and
  * time-series families: each operator is replayed on the driver by a
  * brute-force model written straight from its documented semantics,
  * over random event streams with HEAVY timestamp collisions (a 120 s
  * clock for 60 events) so tie handling, equal-timestamp windows, and
  * horizon boundaries are exercised far beyond what the directed
  * specs or the sf0.01 fixture reach.
  *
  * Rationale (r16 self-review): the r15 `neighborhoodAggPaths`
  * undercount survived BOTH the oracle and the directed specs because
  * the fixture lacked duplicate value rows — random-input differential
  * tests are the class of check that catches oracle-blessed bugs.
  * GraphOpsSpec already runs union-find/driver replays on random
  * graphs; this closes the same gap for the funnel family, where the
  * chained-cumulative-min window composition is the most intricate
  * single plan in the analytics tier.
  */
class AnalyticsPropertySpec extends SparkSpec {
  import spark.implicits._

  private val STEPS = Seq("view", "click", "buy")
  private val TYPES = Vector("view", "click", "buy", "ping")
  private val BASE = 1704100000L // fixed epoch anchor (2024-01-01, UTC)

  /** (user, epochSec, type, tie) — the tie id is unique per stream. */
  private type Ev = (String, Long, String, Long)

  private def randomEvents(rnd: scala.util.Random, n: Int = 60,
                           clockSecs: Int = 120, days: Int = 1): Seq[Ev] =
    (0 until n).map { i =>
      val spread =
        if (days <= 1) rnd.nextInt(clockSecs).toLong
        else rnd.nextInt(days).toLong * 86400L + rnd.nextInt(clockSecs).toLong
      (s"u${rnd.nextInt(5)}", BASE + spread, TYPES(rnd.nextInt(TYPES.size)), i.toLong)
    }

  private def toDf(evs: Seq[Ev]): DataFrame =
    evs.map { case (u, s, t, id) => (u, new Timestamp(s * 1000L), t, id) }
      .toDF("user_id", "ts", "event_type", "event_id")

  private def sortedPerUser(evs: Seq[Ev]): Map[String, Seq[Ev]] =
    evs.groupBy(_._1).view.mapValues(_.sortBy(e => (e._2, e._4))).toMap

  // ---- brute-force models (straight from the scaladoc semantics) ----

  /** Per-user earliest-valid completion times of each step: the
    * sequential reading of the chained cumulative-min (rows in
    * (ts, tie) order; step 0 anchors; step i needs ts strictly after
    * the step-(i-1) completion and, with a horizon, ts ≤ t0 + h). */
  private def bruteCompletions(evs: Seq[Ev], h: Option[Long]): Map[String, Array[Option[Long]]] =
    sortedPerUser(evs).map { case (u, rows) =>
      val r = Array.fill[Option[Long]](STEPS.size)(None)
      rows.foreach { case (_, t, typ, _) =>
        val j = STEPS.indexOf(typ)
        if (j == 0) { if (r(0).isEmpty) r(0) = Some(t) }
        else if (j > 0) {
          val ok = r(j - 1).exists(p => t > p) &&
            h.forall(hh => r(0).exists(a => t <= a + hh))
          if (ok && r(j).isEmpty) r(j) = Some(t)
        }
      }
      u -> r
    }

  private def bruteFunnel(evs: Seq[Ev], h: Option[Long]): Map[String, Long] = {
    val comp = bruteCompletions(evs, h)
    STEPS.indices.map(i => STEPS(i) -> comp.values.count(_(i).isDefined).toLong).toMap
  }

  /** Session-window re-entry attempts: a step-0 event strictly more
    * than h after the PREVIOUS step-0 opens a new attempt anchored at
    * itself; rows run the chained min inside the current attempt with
    * every step bound by anchor + h. */
  private def bruteReentry(evs: Seq[Ev], h: Long): Map[String, Long] = {
    val flags = sortedPerUser(evs).map { case (u, rows) =>
      var prev0: Option[Long] = None
      var anchor: Option[Long] = None
      val attempts = mutable.LinkedHashMap[Long, Array[Option[Long]]]()
      rows.foreach { case (_, t, typ, _) =>
        if (typ == STEPS.head) {
          if (prev0.forall(p => t > p + h)) anchor = Some(t)
          prev0 = Some(prev0.fold(t)(math.max(_, t)))
        }
        anchor.foreach { a =>
          val r = attempts.getOrElseUpdate(a, Array.fill(STEPS.size)(None))
          val j = STEPS.indexOf(typ)
          val inH = t <= a + h
          if (j == 0) { if (inH && r(0).isEmpty) r(0) = Some(t) }
          else if (j > 0) {
            val ok = r(j - 1).exists(p => t > p) && inH
            if (ok && r(j).isEmpty) r(j) = Some(t)
          }
        }
      }
      u -> STEPS.indices.map(i => attempts.values.exists(_(i).isDefined))
    }
    STEPS.indices.map(i => STEPS(i) -> flags.values.count(_(i)).toLong).toMap
  }

  private def bruteAttribution(evs: Seq[Ev], touches: Seq[String], conv: String,
                               lb: Option[Long]): Map[String, Long] = {
    val counts = mutable.Map[String, Long]().withDefaultValue(0L)
    sortedPerUser(evs).values.foreach { rows =>
      var lastTouch: Option[(String, Long)] = None
      rows.foreach { case (_, t, typ, _) =>
        if (typ == conv) {
          val credit = lastTouch match {
            case Some((tt, tts)) if lb.forall(l => t <= tts + l) => tt
            case _ => "unattributed"
          }
          counts(credit) += 1
        }
        if (touches.contains(typ)) lastTouch = Some((typ, t))
      }
    }
    counts.toMap
  }

  private def day(sec: Long): LocalDate =
    Instant.ofEpochSecond(sec).atZone(ZoneOffset.UTC).toLocalDate

  private def bruteRetention(evs: Seq[Ev], cohortType: String,
                             weeks: Int): Map[(String, Int), Long] = {
    val anchors = evs.filter(_._3 == cohortType).groupBy(_._1)
      .view.mapValues(_.map(_._2).min).toMap
    val cells = mutable.Map[(String, Int), mutable.Set[String]]()
    evs.foreach { case (u, t, _, _) =>
      anchors.get(u).foreach { a =>
        if (t >= a) {
          val off = math.floorDiv(
            java.time.temporal.ChronoUnit.DAYS.between(day(a), day(t)), 7L).toInt
          if (off < weeks) {
            val monday = day(a).minusDays(day(a).getDayOfWeek.getValue - 1L)
            cells.getOrElseUpdate((monday.toString, off), mutable.Set()) += u
          }
        }
      }
    }
    cells.view.mapValues(_.size.toLong).toMap
  }

  private def bruteRollingActive(evs: Seq[Ev], w: Int): Map[String, Long] = {
    val activity = evs.map { case (u, t, _, _) => (u, day(t)) }.distinct
    activity.map(_._2).distinct.map { d =>
      d.toString -> activity.filter { case (_, ad) =>
        !ad.isAfter(d) && ad.isAfter(d.minusDays(w.toLong))
      }.map(_._1).distinct.size.toLong
    }.toMap
  }

  private def bruteTransitions(evs: Seq[Ev]): Map[(String, String), Long] = {
    val counts = mutable.Map[(String, String), Long]().withDefaultValue(0L)
    sortedPerUser(evs).values.foreach { rows =>
      rows.map(_._3).sliding(2).foreach {
        case Seq(a, b) => counts((a, b)) += 1
        case _         => ()
      }
    }
    counts.toMap
  }

  private def brutePaths(evs: Seq[Ev], len: Int, k: Int): Seq[(String, Long, Int)] = {
    val counts = mutable.Map[String, Long]().withDefaultValue(0L)
    sortedPerUser(evs).values.foreach { rows =>
      rows.map(_._3).sliding(len).foreach { g =>
        if (g.size == len) counts(g.mkString(">")) += 1
      }
    }
    counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(k)
      .zipWithIndex.map { case ((p, n), i) => (p, n, i + 1) }
  }

  /** LOCF resample model: last (ts, tie) observation wins per bucket,
    * grid spans each key's own [first, last] bucket, gaps inherit. */
  private def bruteResample(obs: Seq[(String, Long, Long, Int)], // key, sec, tie, value
                            step: Long): Set[(String, Long, Int, String)] = {
    obs.groupBy(_._1).flatMap { case (key, rows) =>
      val bucketed = rows.map { case (_, s, tie, v) =>
        (math.floorDiv(s, step) * step, s, tie, v)
      }
      val winners = bucketed.groupBy(_._1).view.mapValues(
        _.maxBy(r => (r._2, r._3))._4).toMap
      val mn = winners.keys.min
      val mx = winners.keys.max
      var lastV = 0
      (mn to mx by step).map { b =>
        winners.get(b) match {
          case Some(v) => lastV = v; (key, b, v, "obs")
          case None    => (key, b, lastV, "fill")
        }
      }
    }.toSet
  }

  // ---- the differential trials ----

  private val TRIALS = 6

  test("funnel ≡ driver replay on random collision-heavy streams (± horizon)") {
    val rnd = new scala.util.Random(1016)
    (1 to TRIALS).foreach { trial =>
      val evs = randomEvents(rnd)
      val df = toDf(evs)
      val h = if (trial % 2 == 0) Some(30L) else None
      val got = EventAnalytics.funnel(df, "user_id", "ts", "event_type",
          STEPS, "event_id", h)
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
      assert(got == bruteFunnel(evs, h), s"trial $trial h=$h events=$evs")
    }
  }

  test("funnelTimes ≡ driver replay: transition counts and exact second-granular averages") {
    val rnd = new scala.util.Random(2016)
    (1 to TRIALS).foreach { trial =>
      val evs = randomEvents(rnd)
      val comp = bruteCompletions(evs, None)
      val rows = EventAnalytics.funnelTimes(toDf(evs), "user_id", "ts",
          "event_type", STEPS, "event_id")
        .collect().map(r => r.getInt(0) ->
          (r.getLong(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
        .toMap
      STEPS.indices.tail.foreach { i =>
        val gaps = comp.values.toSeq.flatMap { r =>
          for (a <- r(i - 1); b <- r(i)) yield (b - a).toDouble
        }
        val (n, avg) = rows(i + 1)
        assert(n == gaps.size.toLong, s"trial $trial step $i count")
        if (gaps.nonEmpty)
          assert(math.abs(avg.get - gaps.sum / gaps.size) < 1e-9,
            s"trial $trial step $i avg")
        else assert(avg.isEmpty, s"trial $trial step $i should be NULL")
      }
    }
  }

  test("funnelReentry ≡ driver replay of the session-window attempt semantics") {
    val rnd = new scala.util.Random(3016)
    (1 to TRIALS).foreach { trial =>
      val evs = randomEvents(rnd)
      val h = Seq(15L, 30L, 60L)(trial % 3)
      val got = EventAnalytics.funnelReentry(toDf(evs), "user_id", "ts",
          "event_type", STEPS, "event_id", h)
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
      assert(got == bruteReentry(evs, h), s"trial $trial h=$h events=$evs")
    }
  }

  test("attribution ≡ driver replay (± lookback), unattributed included") {
    val rnd = new scala.util.Random(4016)
    (1 to TRIALS).foreach { trial =>
      val evs = randomEvents(rnd)
      val lb = if (trial % 2 == 0) Some(20L) else None
      val got = EventAnalytics.attribution(toDf(evs), "user_id", "ts",
          "event_type", Seq("view", "click"), "buy", "event_id", lb)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == bruteAttribution(evs, Seq("view", "click"), "buy", lb),
        s"trial $trial lb=$lb events=$evs")
    }
  }

  test("retention ≡ driver replay: anchor-relative day offsets, Monday cohort labels") {
    val rnd = new scala.util.Random(5016)
    (1 to TRIALS).foreach { trial =>
      val evs = randomEvents(rnd, days = 21)
      val got = EventAnalytics.retention(toDf(evs), "user_id", "ts",
          "event_type", "view", weeks = 3)
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(got == bruteRetention(evs, "view", 3), s"trial $trial events=$evs")
    }
  }

  test("rollingActiveUsers ≡ driver replay across multi-day streams") {
    val rnd = new scala.util.Random(6016)
    (1 to TRIALS).foreach { trial =>
      val evs = randomEvents(rnd, days = 10)
      val w = Seq(1, 3, 7)(trial % 3)
      val got = EventAnalytics.rollingActiveUsers(toDf(evs), "user_id", "ts", w)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == bruteRollingActive(evs, w), s"trial $trial w=$w events=$evs")
    }
  }

  test("eventTransitions and frequentPaths ≡ driver replay, deterministic ranks") {
    val rnd = new scala.util.Random(7016)
    (1 to TRIALS).foreach { trial =>
      val evs = randomEvents(rnd)
      val df = toDf(evs)
      val gotT = EventAnalytics.eventTransitions(df, "user_id", "ts",
          "event_type", "event_id")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(gotT == bruteTransitions(evs), s"trial $trial transitions")
      val gotP = EventAnalytics.frequentPaths(df, "user_id", "ts",
          "event_type", "event_id", len = 3, k = 5)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
        .sortBy(_._3)
      assert(gotP == brutePaths(evs, 3, 5), s"trial $trial paths")
    }
  }

  test("sigmaFlags ≡ BigInt driver replay (nulls AND wild magnitudes excluded)") {
    val rnd = new scala.util.Random(9016)
    // unsnappable (beyond DECIMAL(18,4), |v| ≥ 1e14) ≡ NULL: excluded
    // from n/S/Q, NULL verdict (r19 ANSI cast audit — wild magnitudes
    // pinned in the generator so the try_cast exclusion stays honest)
    def snapOpt(v: Double): Option[Long] =
      if (math.abs(v) >= 1e14) None
      else Some(java.math.BigDecimal.valueOf(v).setScale(4, java.math.RoundingMode.HALF_UP)
        .movePointRight(4).longValueExact())
    (1 to TRIALS).foreach { trial =>
      val rows = (0 until 50).map { i =>
        val v = if (rnd.nextInt(10) == 0) None
                else if (rnd.nextInt(15) == 0)
                  Some(if (rnd.nextBoolean()) 9.9e15 else -9.9e15) // wild
                else Some((rnd.nextGaussian() * 50 + 100) +
                  (if (rnd.nextInt(12) == 0) 400.0 else 0.0))
        (s"g${rnd.nextInt(3)}", i.toLong, v.map(x =>
          if (math.abs(x) >= 1e14) x else math.rint(x * 1000) / 1000))
      }
      val k = 1 + trial % 3
      val stats = rows.groupBy(_._1).map { case (g, rs) =>
        val us = rs.flatMap(_._3).flatMap(snapOpt)
        g -> (BigInt(us.size), us.map(BigInt(_)).sum, us.map(u => BigInt(u) * u).sum)
      }
      val expect = rows.map { case (g, id, v) =>
        val (n, s, q) = stats(g)
        id -> v.flatMap(snapOpt).map { u =>
          val dev = n * u - s
          dev * dev > BigInt(k.toLong * k) * (n * q - s * s)
        }
      }.toMap
      val got = graft.analytics.AnomalyOps.sigmaFlags(
          rows.toDF("grp", "id", "value"), "grp", "value", k = k)
        .collect().map(r => r.getLong(1) ->
          Option(r.getAs[java.lang.Boolean]("is_anomaly")).map(_.booleanValue()))
        .toMap
      assert(got == expect, s"trial $trial k=$k")
    }
  }

  test("twoProportionTest ≡ BigInt driver replay of the pooled z-test") {
    val rnd = new scala.util.Random(10016)
    (1 to TRIALS).foreach { trial =>
      val rows = (0 until 80).map { _ =>
        (s"e${rnd.nextInt(3)}", if (rnd.nextBoolean()) "a" else "b",
          rnd.nextInt(3) == 0)
      }
      val z = 1 + trial % 3
      val expect = rows.groupBy(_._1).map { case (g, rs) =>
        val nA = BigInt(rs.count(_._2 == "a")); val cA = BigInt(rs.count(r => r._2 == "a" && r._3))
        val nB = BigInt(rs.count(_._2 == "b")); val cB = BigInt(rs.count(r => r._2 == "b" && r._3))
        val dev = cA * nB - cB * nA
        val sig = nA > 0 && nB > 0 &&
          dev * dev * (nA + nB) >
            BigInt(z.toLong * z) * (cA + cB) * (nA + nB - cA - cB) * nA * nB
        g -> (nA.toLong, cA.toLong, nB.toLong, cB.toLong, sig)
      }
      val got = graft.analytics.ExperimentOps.twoProportionTest(
          rows.toDF("grp", "arm", "success"), "grp", "arm", "success", z = z)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
        .toMap
      assert(got == expect, s"trial $trial z=$z")
    }
  }

  test("rollingAgg ≡ exact-decimal driver replay; wild magnitudes excluded from sum AND count") {
    // the rolling member of the r19 ANSI sweep, randomized: values mix
    // gaussians, NULLs, exact DECIMAL(12,2) envelope boundaries, and
    // wild magnitudes (±1e11, ±9.9e15 — beyond the snap, excluded like
    // NULLs; the envelope boundary 9999999999.99 itself snaps)
    val rnd = new scala.util.Random(9019)
    def snapOpt(v: java.lang.Double): Option[java.math.BigDecimal] =
      Option(v).map(x => java.math.BigDecimal.valueOf(x)
        .setScale(2, java.math.RoundingMode.HALF_UP))
        .filter(_.abs.compareTo(new java.math.BigDecimal("9999999999.99")) <= 0)
    (1 to TRIALS).foreach { trial =>
      val n = 2 + trial % 3
      val rows: Seq[(String, Long, java.lang.Double)] = (0 until 60).map { i =>
        val v: java.lang.Double = rnd.nextInt(12) match {
          case 0 => null
          case 1 => if (rnd.nextBoolean()) 1e11 else -1e11
          case 2 => if (rnd.nextBoolean()) 9.9e15 else -9.9e15
          case 3 => 9999999999.99 // snaps: the envelope's last value
          case _ => math.rint(rnd.nextGaussian() * 5000) / 100
        }
        (s"k${rnd.nextInt(3)}", i.toLong, v)
      }
      val expect = rows.groupBy(_._1).flatMap { case (_, rs) =>
        val ordered = rs.sortBy(_._2)
        ordered.indices.map { i =>
          val frame = ordered.slice(math.max(0, i - n + 1), i + 1)
          val us = frame.flatMap(r => snapOpt(r._3))
          val sum = if (us.isEmpty) None
                    else Some(us.reduce(_ add _).doubleValue)
          val cnt = us.size.toLong
          ordered(i)._2 -> (sum, cnt, sum.filter(_ => cnt > 0).map(_ / cnt))
        }
      }
      val got = TimeSeriesOps.rollingAgg(
          rows.toDF("k", "t", "value"), "k", "t", "value", nRows = n)
        .collect().map(r => r.getLong(1) ->
          (Option(r.getAs[java.lang.Double]("roll_sum")).map(_.doubleValue()),
            r.getAs[Long]("roll_n"),
            Option(r.getAs[java.lang.Double]("roll_avg")).map(_.doubleValue())))
        .toMap
      assert(got == expect, s"trial $trial n=$n")
    }
  }

  test("rollingSigmaFlags ≡ BigInt windowed ledger; wilds excluded from baselines, NULL verdicts") {
    // the rolling twin of the sigmaFlags differential, randomized with
    // NULLs, level spikes, and wild magnitudes: unsnappable values are
    // excluded from every later window's (n,S,Q) AND get a NULL
    // verdict themselves when a testable baseline exists (n>=2); the
    // under-2-window never-flag rule applies to them too
    val rnd = new scala.util.Random(9021)
    def snapOpt(v: java.lang.Double): Option[BigInt] =
      Option(v).filter(x => math.abs(x) < 1e14).map(x =>
        BigInt(java.math.BigDecimal.valueOf(x)
          .setScale(4, java.math.RoundingMode.HALF_UP)
          .movePointRight(4).toBigIntegerExact))
    (1 to TRIALS).foreach { trial =>
      val n = 3 + trial % 3
      val k = 1 + trial % 3
      val rows: Seq[(String, Long, java.lang.Double)] = (0 until 60).map { i =>
        val v: java.lang.Double = rnd.nextInt(12) match {
          case 0 => null
          case 1 => if (rnd.nextBoolean()) 9.9e15 else -9.9e15
          case 2 => 400.0 + rnd.nextInt(5) // level spikes
          case _ => math.rint((rnd.nextGaussian() * 50 + 100) * 1000) / 1000
        }
        (s"g${rnd.nextInt(3)}", i.toLong, v)
      }
      val expect = rows.groupBy(_._1).flatMap { case (_, rs) =>
        val ordered = rs.sortBy(_._2)
        ordered.indices.map { i =>
          val win = ordered.slice(math.max(0, i - n), i) // prior nRows rows
          val us = win.flatMap(r => snapOpt(r._3))
          val (cn, cs, cq) = (BigInt(us.size), us.sum, us.map(u => u * u).sum)
          val flag: Option[Boolean] =
            if (cn < 2) Some(false)
            else snapOpt(ordered(i)._3).map { u =>
              val dev = cn * u - cs
              dev * dev > BigInt(k.toLong * k) * (cn * cq - cs * cs)
            } // None = NULL verdict (unsnappable row over a live baseline)
          ordered(i)._2 -> (us.size.toLong, flag)
        }
      }
      val got = graft.analytics.AnomalyOps.rollingSigmaFlags(
          rows.toDF("grp", "t", "value"), "grp", "t", "value", nRows = n, k = k)
        .collect().map(r => r.getLong(1) ->
          (r.getAs[Long]("n_window"),
            Option(r.getAs[java.lang.Boolean]("is_anomaly")).map(_.booleanValue())))
        .toMap
      assert(got == expect, s"trial $trial n=$n k=$k")
    }
  }

  test("sigma family ≡ breach-aware BigInt replay at boundary magnitudes (grouped + rolling)") {
    // The r19 long-sum regime, randomized: values just BELOW the
    // DECIMAL(18,4) snap boundary (u ≈ ±9.9e17) drive group/window
    // sums across the old long-wrap point (9.2e18) and the comparison
    // products across the 38-digit envelope. The model replays the
    // engine's EXACT degradation algebra: grouped S is D38-exact
    // always; window S is a checked LONG sum (None past ±9.2e18 —
    // boundary values are kept positive here so prefix ≡ final
    // overflow and frame evaluation order is invisible); Q is a
    // try_sum; every comparison product Nones out at |x| ≥ 10^38.
    // Even trials are boundary-heavy (sums breach), odd trials sparse
    // (real flags dominate) — both regimes every run.
    val rnd = new scala.util.Random(9031)
    val L = BigInt(10).pow(38)
    val LMAX = BigInt(Long.MaxValue)
    def tryMul(a: Option[BigInt], b: Option[BigInt]): Option[BigInt] =
      for { x <- a; y <- b; p = x * y if p.abs < L } yield p
    def trySub(a: Option[BigInt], b: Option[BigInt]): Option[BigInt] =
      for { x <- a; y <- b; d = x - y if d.abs < L } yield d
    def snapOpt(v: java.lang.Double): Option[BigInt] =
      Option(v).filter(x => math.abs(x) < 1e14).map(x =>
        BigInt(java.math.BigDecimal.valueOf(x)
          .setScale(4, java.math.RoundingMode.HALF_UP)
          .movePointRight(4).toBigIntegerExact))
    def verdict(n: BigInt, sOpt: Option[BigInt], qOpt: Option[BigInt],
                u: Option[BigInt], k: Int): Option[Boolean] = {
      val rhs = tryMul(Some(BigInt(k.toLong * k)),
        trySub(tryMul(Some(n), qOpt), tryMul(sOpt, sOpt)))
      for {
        uu <- u
        dev <- trySub(tryMul(Some(n), Some(uu)), sOpt)
        l <- tryMul(Some(dev), Some(dev))
        r <- rhs
      } yield l > r
    }
    var breachVerdicts = 0   // NULL from a product/sum breach (u snappable)
    var realVerdicts = 0     // computed booleans
    var wrappedWindows = 0   // window S past the long envelope
    (1 to TRIALS).foreach { trial =>
      val k = 1 + trial % 3
      val pBoundary = if (trial % 2 == 0) 7 else 1 // in 9
      val rows: Seq[(String, Long, java.lang.Double)] = (0 until 40).map { i =>
        val v: java.lang.Double = rnd.nextInt(9) match {
          case 0 => null
          case 1 => if (rnd.nextBoolean()) 9.9e15 else -9.9e15 // excluded
          case c if c - 2 < pBoundary =>                        // boundary
            (90000 + rnd.nextInt(9900)).toDouble * 1e9
          case _ => math.rint((rnd.nextGaussian() * 50 + 100) * 1000) / 1000
        }
        (s"g${rnd.nextInt(2)}", i.toLong, v)
      }
      // grouped: S exact (D38), Q try_sum, products try_
      val stats = rows.groupBy(_._1).map { case (g, rs) =>
        val us = rs.flatMap(r => snapOpt(r._3))
        val q = us.map(u => u * u).sum
        g -> (BigInt(us.size), Some(us.sum),
          Some(q).filter(_.abs < L))
      }
      val expectG = rows.map { case (g, id, v) =>
        val (n, s, q) = stats(g)
        id -> verdict(n, s, q, snapOpt(v), k)
      }.toMap
      val gotG = graft.analytics.AnomalyOps.sigmaFlags(
          rows.toDF("grp", "id", "value"), "grp", "value", k = k)
        .collect().map(r => r.getLong(1) ->
          Option(r.getAs[java.lang.Boolean]("is_anomaly")).map(_.booleanValue()))
        .toMap
      assert(gotG == expectG, s"grouped trial $trial k=$k")
      rows.foreach { case (g, id, v) =>
        if (snapOpt(v).nonEmpty)
          expectG(id) match {
            case None    => breachVerdicts += 1
            case Some(_) => realVerdicts += 1
          }
      }
      // rolling: window S checked-LONG (None past the long envelope);
      // frames are long enough that boundary-dense trials push window
      // sums past 9.2e18 (the coverage asserts below prove it)
      val n = 14 + trial % 5
      val expectR = rows.groupBy(_._1).flatMap { case (_, rs) =>
        val ordered = rs.sortBy(_._2)
        ordered.indices.map { i =>
          val win = ordered.slice(math.max(0, i - n), i)
          val us = win.flatMap(r => snapOpt(r._3))
          val cn = BigInt(us.size)
          val sOpt = Some(us.sum).filter(_.abs <= LMAX)
          if (sOpt.isEmpty) wrappedWindows += 1
          val qOpt = Some(us.map(u => u * u).sum).filter(_.abs < L)
          val flag: Option[Boolean] =
            if (cn < 2) Some(false)
            else verdict(cn, sOpt, qOpt, snapOpt(ordered(i)._3), k)
          ordered(i)._2 -> flag
        }
      }
      val gotR = graft.analytics.AnomalyOps.rollingSigmaFlags(
          rows.toDF("grp", "t", "value"), "grp", "t", "value", nRows = n, k = k)
        .collect().map(r => r.getLong(1) ->
          Option(r.getAs[java.lang.Boolean]("is_anomaly")).map(_.booleanValue()))
        .toMap
      assert(gotR == expectR, s"rolling trial $trial n=$n k=$k")
    }
    // the generator must actually reach both regimes, or the
    // differential is vacuous
    assert(breachVerdicts > 0, "no breach-caused NULL verdict generated")
    assert(realVerdicts > 0, "no computed verdict generated")
    assert(wrappedWindows > 0, "no window crossed the long envelope")
  }

  test("resampleFill ≡ driver LOCF replay: last-wins buckets, per-key grids, fill flags") {
    val rnd = new scala.util.Random(8016)
    (1 to TRIALS).foreach { trial =>
      val step = Seq(10L, 30L, 60L)(trial % 3)
      val obs = (0 until 40).map { i =>
        (s"k${rnd.nextInt(3)}", BASE + rnd.nextInt(600).toLong, i.toLong, rnd.nextInt(100))
      }
      val df = obs.map { case (k, s, tie, v) => (k, new Timestamp(s * 1000L), tie, v) }
        .toDF("key", "ts", "tie", "value")
      val got = TimeSeriesOps.resampleFill(df, "key", "ts", "value", "tie", step)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getString(3)))
        .toSet
      assert(got == bruteResample(obs, step), s"trial $trial step=$step")
    }
  }
}
