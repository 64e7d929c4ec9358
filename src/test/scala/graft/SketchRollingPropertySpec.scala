package graft

import java.sql.Timestamp

import graft.profile.{HistSketch, Sketches}

/** Randomized DIFFERENTIAL tests for the ROLLING and GROUPED sketch
  * tiers — the day-fan trailing-window merges and group-partitioned
  * rank selections `SketchPropertySpec` leaves untreated. Same
  * bit-exact stance: per-day histograms/registers modeled on the
  * driver, trailing windows merged by sum/max per the documented
  * algebra, quantiles/estimates replayed with the exact rank and
  * estimator arithmetic. Timestamp collisions (many events on one
  * day, sparse days with gaps inside the trailing window) are the
  * inputs the fixture lacks.
  */
class SketchRollingPropertySpec extends SparkSpec {
  import spark.implicits._

  private val s = 16
  private def ls = Integer.numberOfTrailingZeros(s)

  private def mBucket(v: Long): Int = {
    if (v <= 0L) return 0
    val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
    val lo = 1L << e
    val sub =
      if (e < ls) ((v - lo) * s) / lo
      else if (e == ls) v - lo
      else (v - lo) / (1L << (e - ls))
    (1L + e.toLong * s + sub).toInt
  }

  private def mLower(b: Int): Long = {
    if (b <= 0) return 0L
    val e = (b - 1) / s
    val j = (b - 1) % s
    val step =
      if (e < ls) (j.toLong * (1L << e) + (s - 1)) / s
      else if (e == ls) j.toLong
      else j.toLong * (1L << (e - ls))
    (1L << e) + step
  }

  private def mQuantiles(hist: Map[Int, Long], ps: Seq[Double]): Map[Double, Long] = {
    val sorted = hist.toSeq.sortBy(_._1)
    val n = sorted.map(_._2).sum
    ps.map { p =>
      val rank = math.max(1L, math.ceil(p * n.toDouble).toLong)
      var cum = 0L
      p -> mLower(sorted.find { case (_, c) => cum += c; cum >= rank }.get._1)
    }.toMap
  }

  // epoch-day helpers: UTC session timezone, so the date is the UTC day
  private val Day0 = java.time.LocalDate.of(2024, 3, 1)
  private def tsOn(day: Int, sec: Int): Timestamp =
    Timestamp.from(Day0.plusDays(day).atStartOfDay(java.time.ZoneOffset.UTC)
      .plusSeconds(sec).toInstant)
  private def dayStr(day: Int): String = Day0.plusDays(day).toString

  test("histRollingQuantiles ≡ trailing-window sum-merge replay with gap days") {
    val rnd = new scala.util.Random(17040)
    val windowDays = 3
    val ps = Seq(0.5, 0.9)
    (1 to 3).foreach { trial =>
      // days 0,1,4,5 have data; 2,3 are gaps INSIDE later windows
      val rows = Seq(0, 1, 4, 5).flatMap { d =>
        Seq.fill(5 + rnd.nextInt(20))((tsOn(d, rnd.nextInt(86400)),
          (8 + rnd.nextInt(2000)).toLong))
      }
      val perDay: Map[Int, Map[Int, Long]] = rows
        .groupBy { case (ts, _) =>
          java.time.Instant.ofEpochMilli(ts.getTime).atZone(java.time.ZoneOffset.UTC)
            .toLocalDate.toEpochDay - Day0.toEpochDay }
        .map { case (d, rs) => d.toInt ->
          rs.groupBy { case (_, v) => mBucket(v) }.view.mapValues(_.size.toLong).toMap }
      val expect = perDay.keySet.flatMap { d =>
        val merged = perDay.filter { case (e, _) => e <= d && e > d - windowDays }
          .values.flatten.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        mQuantiles(merged, ps).map { case (p, v) => (dayStr(d), p, v) }
      }
      val got = HistSketch.histRollingQuantiles(rows.toDF("ts", "v"), "v", "ts",
          windowDays, ps, s)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      assert(got == expect, s"trial $trial")
    }
  }

  test("hllRollingEstimate ≡ trailing register-max replay, bit-exact estimates") {
    val rnd = new scala.util.Random(17041)
    val b = 6
    val windowDays = 2
    def portableHash(str: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(str.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.lang.Long.parseLong(d.map(x => f"$x%02x").mkString.substring(0, 15), 16)
    }
    def regs(keys: Seq[String]): Map[Int, Int] = {
      val nBits = 60 - b
      keys.map(portableHash).groupBy(h => (h & ((1L << b) - 1)).toInt)
        .view.mapValues(_.map { h =>
          val w = h >> b
          if (w == 0L) nBits + 1 else java.lang.Long.numberOfTrailingZeros(w) + 1
        }.max).toMap
    }
    def est(r: Map[Int, Int]): (Double, Long) = {
      val m = 1L << b; val maxRho = 60 - b + 1; val emptyTerm = 1L << maxRho
      val sp = r.values.map(x => 1L << (maxRho - x)).sum
      (Sketches.alphaNumerator(b) / (sp + (m - r.size) * emptyTerm).toDouble, r.size.toLong)
    }
    val rows = Seq(0, 1, 3).flatMap { d =>
      Seq.fill(40)((tsOn(d, rnd.nextInt(86400)), s"u${rnd.nextInt(60)}"))
    }
    val byDay: Map[Int, Seq[String]] = rows.groupBy { case (ts, _) =>
      (java.time.Instant.ofEpochMilli(ts.getTime).atZone(java.time.ZoneOffset.UTC)
        .toLocalDate.toEpochDay - Day0.toEpochDay).toInt
    }.view.mapValues(_.map(_._2)).toMap
    val expect = byDay.keySet.map { d =>
      val keys = byDay.filter { case (e, _) => e <= d && e > d - windowDays }
        .values.flatten.toSeq
      val (e, np) = est(regs(keys))
      (dayStr(d), e, np)
    }
    val got = Sketches.hllRollingEstimate(rows.toDF("ts", "uid"), "uid", "ts",
        windowDays, b)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == expect)
  }

  test("histSketchBy + histQuantilesBy ≡ per-group replay; groups never bleed") {
    val rnd = new scala.util.Random(17042)
    val rows = (0 until 120).map { _ =>
      (Seq("a", "b", "c")(rnd.nextInt(3)), (1 + rnd.nextInt(500)).toLong)
    }
    val ps = Seq(0.25, 0.75)
    val byGroup = rows.groupBy(_._1).view.mapValues(rs =>
      rs.groupBy { case (_, v) => mBucket(v) }.view.mapValues(_.size.toLong).toMap).toMap
    val sk = HistSketch.histSketchBy(rows.toDF("g", "v"), Seq("g"), "v", s)
    val gotSk = sk.collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val expSk = byGroup.flatMap { case (g, h) => h.map { case (b0, c) => (g, b0) -> c } }
    assert(gotSk == expSk)
    val gotQ = HistSketch.histQuantilesBy(sk, Seq("g"), ps, s)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    val expQ = byGroup.flatMap { case (g, h) =>
      mQuantiles(h, ps).map { case (p, v) => (g, p) -> v } }
    assert(gotQ == expQ)
  }

  test("histMadBandSigned ≡ boundary-weighted deviation replay on signed fractional data") {
    val rnd = new scala.util.Random(17043)
    val scaleBy = 1000L
    val k = 2
    val vs = Seq.fill(60)((rnd.nextDouble() - 0.5) * 20.0) ++ Seq(0.0, -9.5, 9.5)
    val scaled = vs.map(v => (v * scaleBy.toDouble).toLong)
    def mBucketSigned(v: Long): Int =
      if (v == 0L) 0 else if (v > 0) mBucket(v) else -mBucket(-v)
    def mLowerSigned(b0: Int): Long =
      if (b0 == 0) 0L else if (b0 > 0) mLower(b0) else -mLower(-b0)
    val hist = scaled.groupBy(mBucketSigned).view.mapValues(_.size.toLong).toMap
    // median at bucket granularity (rank 0.5 over signed bucket order)
    val sortedH = hist.toSeq.sortBy(_._1)
    val n = sortedH.map(_._2).sum
    val medRank = math.max(1L, math.ceil(0.5 * n.toDouble).toLong)
    var cum = 0L
    val med = mLowerSigned(sortedH.find { case (_, c) => cum += c; cum >= medRank }.get._1)
    // deviation distribution over representative boundaries
    val dev = hist.toSeq.map { case (b0, c) => math.abs(mLowerSigned(b0) - med) -> c }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val dRank = math.max(1L, math.ceil(0.5 * n.toDouble).toLong)
    var dcum = 0L
    val mad = dev.find { case (_, c) => dcum += c; dcum >= dRank }.get._1
    val sk = HistSketch.histSketchSigned(vs.toDF("v"), "v", s, scaleBy)
    val r = HistSketch.histMadBandSigned(sk, k, s).head()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((med, mad, med - k * mad, med + k * mad)),
      s"got ${(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))} " +
        s"want ${(med, mad, med - k * mad, med + k * mad)}")
  }
}
