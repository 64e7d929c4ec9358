package graft

import scala.collection.mutable

import org.apache.spark.sql.DataFrame

import graft.profile.{CountMin, HistSketch, Sketches}

/** Randomized DIFFERENTIAL tests for the mergeable-sketch family
  * (r16 verdict #1): every sketch operator is replayed on the driver
  * by a brute-force model written straight from its documented
  * arithmetic — the integer bucket ladder, the HLL register algebra,
  * the CM grid, the snapped-log PSI — over random inputs the fixtures
  * lack: single-octave value clusters (every value in one power-of-two
  * band, so sub-bucket arithmetic is the only thing separating them),
  * zeros/negatives, heavy key collisions, and disjoint-bucket drift
  * pairs. The engine's replayability contract says these families are
  * EXACTLY deterministic, so every comparison here is bit-equality —
  * no tolerances.
  *
  * Model independence: bucket/boundary/rank arithmetic is re-derived
  * in plain Scala longs (not by calling the SQL generators); the only
  * shared ingredients are the md5 60-bit portable hash (the documented
  * cross-engine primitive, recomputed here via MessageDigest, not via
  * the engine expression) and `StrictMath.log` (what Spark's
  * log/log2 expressions call — verified against the catalyst
  * bytecode, which binds StrictMath, not Math).
  */
class SketchPropertySpec extends SparkSpec {
  import spark.implicits._

  // ------------- shared model primitives -------------

  /** Driver replay of Hashes.portable: BIGINT of md5(s)'s first 15 hex
    * chars (60 bits, always non-negative). */
  private def portableHash(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** floor(log2(x)·1e8 + 0.5) with Spark's exact libm binding. */
  private def l8(x: Long): Long =
    math.floor(StrictMath.log(x.toDouble) / StrictMath.log(2.0) * 1e8 + 0.5).toLong

  // ------------- HistSketch model -------------

  private def ls(s: Int) = Integer.numberOfTrailingZeros(s)

  /** bucketCaseSql re-derived: v ≤ 0 → 0; octave e = floor(log2 v),
    * base 1 + e·s, sub-bucket by the overflow-proof three-regime
    * formula. */
  private def mBucket(v: Long, s: Int): Int = {
    if (v <= 0L) return 0
    val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
    val lo = 1L << e
    val sub =
      if (e < ls(s)) ((v - lo) * s) / lo
      else if (e == ls(s)) v - lo
      else (v - lo) / (1L << (e - ls(s)))
    (1L + e.toLong * s + sub).toInt
  }

  /** lowerBoundCaseSql re-derived (ceil-form sub-boundary). */
  private def mLower(b: Int, s: Int): Long = {
    if (b <= 0) return 0L
    val e = (b - 1) / s
    val j = (b - 1) % s
    val step =
      if (e < ls(s)) (j.toLong * (1L << e) + (s - 1)) / s
      else if (e == ls(s)) j.toLong
      else j.toLong * (1L << (e - ls(s)))
    (1L << e) + step
  }

  private def mBucketSigned(v: Long, s: Int): Int =
    if (v == 0L) 0 else if (v > 0) mBucket(v, s) else -mBucket(-v, s)

  private def mLowerSigned(b: Int, s: Int): Long =
    if (b == 0) 0L else if (b > 0) mLower(b, s) else -mLower(-b, s)

  /** histQuantiles replay over a bucket→cnt map: rank = max(1,
    * ceil(p·N)) (the engine's one IEEE multiply), first bucket in
    * ascending id order whose cumulative count reaches it. */
  private def mQuantiles(hist: Map[Int, Long], ps: Seq[Double],
                         lower: Int => Long): Map[Double, Long] = {
    val sorted = hist.toSeq.sortBy(_._1)
    val n = sorted.map(_._2).sum
    ps.map { p =>
      val rank = math.max(1L, math.ceil(p * n.toDouble).toLong)
      var cum = 0L
      val b = sorted.find { case (_, c) => cum += c; cum >= rank }.get._1
      p -> lower(b)
    }.toMap
  }

  private def histOf(vs: Seq[Long], s: Int): Map[Int, Long] =
    vs.groupBy(mBucket(_, s)).view.mapValues(_.size.toLong).toMap

  test("histSketch/histMerge/histQuantiles ≡ integer-ladder replay on octave clusters") {
    val rnd = new scala.util.Random(17001)
    val s = 16
    (1 to 4).foreach { trial =>
      // single-octave cluster + zeros/negatives + a wide tail: the
      // cluster makes SUB-bucket arithmetic the only separator
      val base = 1L << (3 + rnd.nextInt(30))
      val cluster = Seq.fill(40)(base + rnd.nextInt(math.min(base, 1000000L).toInt).toLong)
      val edge = Seq(0L, -5L, 1L, 2L, 3L, Long.MaxValue / 2)
      val tail = Seq.fill(10)(math.abs(rnd.nextLong()) % (1L << 45))
      val (va, vb) = (cluster ++ edge, tail ++ cluster.take(7))
      val ps = Seq(0.01, 0.25, 0.5, 0.9, 0.95, 1.0)

      val skA = HistSketch.histSketch(va.toDF("v"), "v", s)
      val skB = HistSketch.histSketch(vb.toDF("v"), "v", s)

      // sketch ≡ model histogram, row for row
      val gotA = skA.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(gotA == histOf(va, s), s"trial $trial sketch A")

      // merge-by-sum ≡ histogram of the concatenation
      val merged = HistSketch.histMerge(skA, skB)
      val gotM = merged.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(gotM == histOf(va ++ vb, s), s"trial $trial merge")

      // quantile read ≡ rank replay, and the value-error contract holds
      val gotQ = HistSketch.histQuantiles(merged, ps, s)
        .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
      val expQ = mQuantiles(histOf(va ++ vb, s), ps, mLower(_, s))
      assert(gotQ == expQ, s"trial $trial quantiles")
      val all = (va ++ vb).sorted
      ps.foreach { p =>
        val rank = math.max(1L, math.ceil(p * all.size.toDouble).toLong)
        val truth = all((rank - 1).toInt)
        val got = gotQ(p)
        assert(got <= math.max(truth, 0L), s"trial $trial p=$p boundary above truth")
        if (truth > 0)
          assert((truth - got).toDouble <= truth.toDouble / s + 1,
            s"trial $trial p=$p rel err: got $got truth $truth")
      }
    }
  }

  test("histSketchSigned + histQuantilesSigned ≡ mirrored-ladder replay with scaleBy") {
    val rnd = new scala.util.Random(17002)
    val s = 16
    val scaleBy = 1000000L
    (1 to 4).foreach { trial =>
      // signed fractional values clustered near zero (both signs in
      // low octaves) plus a fat positive tail, plus WILD magnitudes
      // beyond the scaled long ladder (|v·scaleBy| > Long.Max — r19
      // ANSI cast audit: excluded like NULLs, build never dies)
      val vs = Seq.fill(50)((rnd.nextDouble() - 0.5) * 4.0) ++
        Seq(0.0, -0.0000001, 0.0000001, 123.456, -999.25) ++
        Seq.fill(8)(rnd.nextDouble() * 1e6) ++
        Seq(9.9e15, -9.9e15, Double.NaN)
      val snappable = vs.filter(v => !v.isNaN &&
        math.abs(v) * scaleBy.toDouble <= Long.MaxValue.toDouble)
      val scaled = snappable.map(v => (v * scaleBy.toDouble).toLong) // trunc-to-zero, as the engine casts
      val hist = scaled.groupBy(mBucketSigned(_, s)).view.mapValues(_.size.toLong).toMap

      val sk = HistSketch.histSketchSigned(vs.toDF("v"), "v", s, scaleBy)
      val got = sk.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(got == hist, s"trial $trial signed sketch")

      val ps = Seq(0.05, 0.5, 0.95)
      val gotQ = HistSketch.histQuantilesSigned(sk, ps, s, scaleBy)
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      val expQ = mQuantiles(hist, ps, mLowerSigned(_, s))
        .map { case (p, v) => p -> v.toDouble / scaleBy.toDouble }
      assert(gotQ == expQ, s"trial $trial signed quantiles")
    }
  }

  // ------------- HLL model -------------

  private def hllRegisters(keys: Seq[String], b: Int): Map[Int, Int] = {
    val nBits = 60 - b
    val regs = mutable.Map.empty[Int, Int]
    keys.foreach { k =>
      val h = portableHash(k)
      val bucket = (h & ((1L << b) - 1)).toInt
      val w = h >> b
      val rho = if (w == 0L) nBits + 1
        else java.lang.Long.numberOfTrailingZeros(w) + 1
      regs(bucket) = math.max(regs.getOrElse(bucket, 0), rho)
    }
    regs.toMap
  }

  private def hllEst(regs: Map[Int, Int], b: Int): (Double, Long) = {
    val m = 1L << b
    val maxRho = 60 - b + 1
    val emptyTerm = 1L << maxRho
    val sp = regs.values.map(r => 1L << (maxRho - r)).sum
    val est = Sketches.alphaNumerator(b) /
      (sp + (m - regs.size) * emptyTerm).toDouble
    (est, regs.size.toLong)
  }

  test("hllSketch/hllMerge/hllEstimate ≡ register replay, bit-exact") {
    val rnd = new scala.util.Random(17003)
    val b = 6 // small register file so collisions are dense
    (1 to 4).foreach { trial =>
      val ka = Seq.fill(200)(s"k${rnd.nextInt(150)}") // heavy duplicate keys
      val kb = Seq.fill(120)(s"k${rnd.nextInt(400)}")
      val skA = Sketches.hllSketch(ka.toDF("k"), "k", b)
      val gotA = skA.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      assert(gotA == hllRegisters(ka, b), s"trial $trial registers")

      // merge = register max = registers of the union stream
      val skB = Sketches.hllSketch(kb.toDF("k"), "k", b)
      val gotM = Sketches.hllMerge(skA, skB)
        .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      assert(gotM == hllRegisters(ka ++ kb, b), s"trial $trial merged registers")

      val Array(est) = Sketches.hllEstimate(Sketches.hllMerge(skA, skB), b).collect()
      val (expE, expP) = hllEst(hllRegisters(ka ++ kb, b), b)
      assert(est.getDouble(0) == expE && est.getLong(1) == expP,
        s"trial $trial estimate: got ${est.getDouble(0)}/${est.getLong(1)} want $expE/$expP")
    }
  }

  // ------------- CountMin model -------------

  private def cmGrid(keys: Seq[String], w: Int, d: Int): Map[(Int, Int), Long] = {
    val g = mutable.Map.empty[(Int, Int), Long]
    keys.foreach { k =>
      (0 until d).foreach { r =>
        val c = (portableHash(s"$r|$k") % w).toInt
        g((r, c)) = g.getOrElse((r, c), 0L) + 1L
      }
    }
    g.toMap
  }

  test("cmSketch/cmMerge/cmLookup ≡ grid replay; never undercounts") {
    val rnd = new scala.util.Random(17004)
    val (w, d) = (32, 4) // tiny width so collisions are certain
    (1 to 4).foreach { trial =>
      val ka = Seq.fill(300)(s"x${rnd.nextInt(40)}")
      val kb = Seq.fill(100)(s"x${rnd.nextInt(80)}")
      val skA = CountMin.cmSketch(ka.toDF("k"), "k", w, d)
      val gotA = skA.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(gotA == cmGrid(ka, w, d), s"trial $trial grid")

      val merged = CountMin.cmMerge(skA, CountMin.cmSketch(kb.toDF("k"), "k", w, d))
      val gotM = merged.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      val expG = cmGrid(ka ++ kb, w, d)
      assert(gotM == expG, s"trial $trial merged grid")

      // lookup ≡ min-over-rows replay, and ≥ the true count always
      val probe = (0 until 100).map(i => s"x$i") // includes never-seen keys
      val got = CountMin.cmLookup(merged, probe.toDF("k"), "k", w, d)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val truth = (ka ++ kb).groupBy(identity).view.mapValues(_.size.toLong).toMap
      probe.foreach { k =>
        val exp = (0 until d).map { r =>
          expG.getOrElse((r, (portableHash(s"$r|$k") % w).toInt), 0L)
        }.min
        assert(got(k) == exp, s"trial $trial lookup $k")
        assert(got(k) >= truth.getOrElse(k, 0L), s"trial $trial undercount $k")
      }
    }
  }

  test("cmJoinSize ≡ min row inner product replay; never undercounts the true join size") {
    val rnd = new scala.util.Random(17005)
    val (w, d) = (32, 4)
    val ka = Seq.fill(150)(s"j${rnd.nextInt(25)}")
    val kb = Seq.fill(200)(s"j${rnd.nextInt(50)}")
    val (ga, gb) = (cmGrid(ka, w, d), cmGrid(kb, w, d))
    val exp = (0 until d).map { r =>
      (0 until w).map(c =>
        BigInt(ga.getOrElse((r, c), 0L)) * BigInt(gb.getOrElse((r, c), 0L))).sum
    }.min
    val got = CountMin.cmJoinSize(
      CountMin.cmSketch(ka.toDF("k"), "k", w, d),
      CountMin.cmSketch(kb.toDF("k"), "k", w, d), d).head().getDouble(0)
    assert(got == exp.toDouble, s"joinSize got $got want $exp")
    val ca = ka.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cb = kb.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val truth = ca.keys.map(k => ca(k) * cb.getOrElse(k, 0L)).sum
    assert(got >= truth.toDouble, s"joinSize undercounts: $got < $truth")
  }

  // ------------- PSI model -------------

  /** histDriftPsi replay: Laplace +1 over the union bucket set,
    * probabilities snapped by exact integer floor division, log-ratio
    * decomposed into four snapped log2 terms, exact BigInt weighted
    * sum, one final double division. */
  private def mPsi(a: Map[Int, Long], bm: Map[Int, Long]): (Long, Long, Long, Double) = {
    val buckets = (a.keySet ++ bm.keySet).toSeq.sorted
    val k = buckets.size.toLong
    val na = a.values.sum + k
    val nb = bm.values.sum + k
    val terms = buckets.map { bk =>
      val ca = a.getOrElse(bk, 0L); val cb = bm.getOrElse(bk, 0L)
      val qa = (BigInt(ca + 1) * BigInt(1000000000L) / BigInt(na)).toLong
      val qb = (BigInt(cb + 1) * BigInt(1000000000L) / BigInt(nb)).toLong
      val l = l8(ca + 1) - l8(na) - l8(cb + 1) + l8(nb)
      BigInt(qa - qb) * BigInt(l)
    }
    (k, na - k, nb - k, terms.sum.toDouble / 1e17)
  }

  test("histDriftPsi ≡ snapped-integer replay on disjoint-octave drift pairs") {
    val rnd = new scala.util.Random(17006)
    val s = 16
    (1 to 4).foreach { trial =>
      // A clustered low, B clustered high with partial overlap — plus a
      // same-distribution control that must read PSI == 0
      val va = Seq.fill(60)(8L + rnd.nextInt(8)) ++ Seq.fill(10)(1000L + rnd.nextInt(100))
      val vb = Seq.fill(40)(1000L + rnd.nextInt(100)) ++ Seq.fill(5)(8L + rnd.nextInt(8))
      val skA = HistSketch.histSketch(va.toDF("v"), "v", s)
      val skB = HistSketch.histSketch(vb.toDF("v"), "v", s)
      val r = HistSketch.histDriftPsi(skA, skB).head()
      val (ek, ena, enb, epsi) = mPsi(histOf(va, s), histOf(vb, s))
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ==
        ((ek, ena, enb, epsi)), s"trial $trial psi")
      assert(epsi > 0.0, s"trial $trial drift pair should read positive PSI")

      val same = HistSketch.histDriftPsi(skA, HistSketch.histSketch(va.toDF("v"), "v", s))
        .head().getDouble(3)
      assert(same == 0.0, s"trial $trial identical distributions must read PSI 0, got $same")
    }
  }
}
