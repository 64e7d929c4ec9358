package graft

import org.apache.spark.sql.functions._

import graft.profile.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("rho CASE chain == numberOfTrailingZeros + 1, zero maps to bits+1") {
    val ws = Seq(0L, 1L, 2L, 3L, 4L, 6L, 8L, 96L, 1L << 40, (1L << 49) | 1L,
      (1L << 50) - 1, 1L << 49)
    val got = ws.toDF("w")
      .select(col("w"), expr(Sketches.rhoCaseSql("w", 50, "div")).as("rho"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    ws.foreach { w =>
      val want = if (w == 0L) 51 else java.lang.Long.numberOfTrailingZeros(w) + 1
      assert(got(w) == want, s"w=$w")
    }
  }

  test("estimate lands near the true cardinality") {
    val n = 5000
    val df = (1 to n).map(i => s"key_$i").toDF("k")
    val est = Sketches.hllEstimate(Sketches.hllSketch(df, "k")).head()
    val e = est.getDouble(0)
    // raw estimator at n ≈ 5m: expect single-digit-% error, assert 20%
    assert(math.abs(e - n) / n < 0.20, s"estimate $e for true $n")
    assert(est.getLong(1) <= 1024)
  }

  test("merge of disjoint halves == sketch of the union, register-exact") {
    val a = (1 to 1500).map(i => s"id_$i").toDF("k")
    val b = (1200 to 3000).map(i => s"id_$i").toDF("k") // overlapping
    val whole = Sketches.hllSketch(a.unionByName(b), "k")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val merged = Sketches.hllMerge(
      Sketches.hllSketch(a, "k"), Sketches.hllSketch(b, "k"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(merged == whole)
  }

  test("merge is idempotent") {
    val df = (1 to 400).map(i => s"x$i").toDF("k")
    val s1 = Sketches.hllSketch(df, "k")
    val twice = Sketches.hllMerge(s1, s1)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val once = s1.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(twice == once)
  }

  test("sketch size is bounded by m regardless of input size") {
    val big = (1 to 20000).map(i => s"v$i").toDF("k")
    assert(Sketches.hllSketch(big, "k", b = 6).count() <= 64)
  }

  test("rolling estimate tracks exact trailing-window distincts per active day") {
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // 3 active days: 400 users on d1, the SAME 400 on d3, 300 new on d9
    val rows =
      (1 to 400).map(u => (s"u$u", ts(1))) ++
      (1 to 400).map(u => (s"u$u", ts(3))) ++
      (1000 to 1299).map(u => (s"u$u", ts(9)))
    val df = rows.toDF("user_id", "ts")
    // b=6 (m=64): the RAW estimator needs n >> m — at b=10 these
    // cardinalities sit below the register count, where only the
    // deliberately-excluded linear-counting branch is accurate
    val got = Sketches.hllRollingEstimate(df, "user_id", "ts", windowDays = 3, b = 6)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set("2024-01-01", "2024-01-03", "2024-01-09"))
    // d3's window covers d1+d3 = the same 400 users (merge must not
    // double count); d9 sees only its own 300
    assert(math.abs(got("2024-01-01") - 400) / 400.0 < 0.30)
    assert(math.abs(got("2024-01-03") - 400) / 400.0 < 0.30)
    assert(got("2024-01-03") == got("2024-01-01")) // identical register sets
    assert(math.abs(got("2024-01-09") - 300) / 300.0 < 0.30)
  }

  test("intersection estimate: inclusion-exclusion lands near the true overlap") {
    // |A| = 3000 (1..3000), |B| = 3000 (2001..5000), |A∩B| = 1000
    val a = (1 to 3000).map(i => s"id_$i").toDF("k")
    val b = (2001 to 5000).map(i => s"id_$i").toDF("k")
    val r = Sketches.hllIntersectEstimate(
      Sketches.hllSketch(a, "k"), Sketches.hllSketch(b, "k")).head()
    val (inter, na, nb, nu) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(math.abs(inter - 1000.0) < 500.0, s"intersect estimate $inter")
    // internal consistency: the output IS the inclusion-exclusion identity
    assert(math.abs((na + nb - nu) - inter) < 1e-9)
    assert(nu <= na + nb)
  }

  test("corrected estimate: linear counting bounds error at n < m, raw above") {
    // raw estimator is badly biased below n ≈ m; the corrected tier
    // must land within 5% there (linear counting is near-exact while
    // most registers are empty)
    for (n <- Seq(50, 200, 800)) {
      val df = (1 to n).map(i => s"lc_$i").toDF("k")
      val r = Sketches.hllEstimateCorrected(Sketches.hllSketch(df, "k")).head()
      val (est, tier) = (r.getDouble(0), r.getString(2))
      assert(tier == "linear", s"n=$n tier=$tier")
      // 10%: the fixed-seed draw at n=50 sits ~3σ from its ~2%
      // asymptotic error (deterministic, so this is a bound on THIS
      // hash, not a flaky tolerance)
      assert(math.abs(est - n) / n < 0.10, s"n=$n corrected=$est")
      // and it must beat the raw estimator where raw is biased
      val raw = Sketches.hllEstimate(Sketches.hllSketch(df, "k")).head().getDouble(0)
      assert(math.abs(est - n) <= math.abs(raw - n), s"n=$n raw=$raw corrected=$est")
    }
    // far above m the switch hands back the raw estimate untouched
    val big = (1 to 40000).map(i => s"big_$i").toDF("k")
    val sk = Sketches.hllSketch(big, "k")
    val corr = Sketches.hllEstimateCorrected(sk).head()
    assert(corr.getString(2) == "raw")
    assert(corr.getDouble(0) == Sketches.hllEstimate(sk).head().getDouble(0))
  }

  test("NULL keys are not elements: sketch ignores them like count_distinct") {
    val withNulls = (1 to 300).map(i => Option(s"k$i")).toDF("k")
      .unionByName(Seq.fill(50)(Option.empty[String]).toDF("k"))
    val clean = (1 to 300).map(i => s"k$i").toDF("k")
    val a = Sketches.hllSketch(withNulls, "k").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    val b = Sketches.hllSketch(clean, "k").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(a == b)   // no phantom NULL-bucket register
  }

  test("estimating a sketch with a smaller b than it was built with fails loudly") {
    val df = (1 to 2000).map(i => s"k$i").toDF("k")
    val sk12 = Sketches.hllSketch(df, "k", b = 12)
    val err = intercept[Exception] {
      Sketches.hllEstimate(sk12, b = 8).collect()
    }
    assert(err.getMessage.contains("bucket >= 2^8") ||
      Option(err.getCause).exists(_.getMessage.contains("bucket >= 2^8")))
    // matched b still estimates fine
    assert(Sketches.hllEstimate(sk12, b = 12).head().getDouble(0) > 0)
  }

  test("grouped sketch: per-group registers match per-group global sketches") {
    val rows = (1 to 3000).map(i => (s"g${i % 3}", s"k${i % 700}"))
    val df = rows.toDF("g", "k")
    val grouped = Sketches.hllSketchBy(df, Seq("g"), "k")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = Sketches.hllSketch(df.where(col("g") === g), "k")
        .collect().map(r => (g, r.getInt(0)) -> r.getInt(1)).toMap
      assert(grouped.view.filterKeys(_._1 == g).toMap == solo, s"group $g")
    }
    // grouped merge of disjoint halves ≡ grouped sketch of the union,
    // and the per-group estimate tracks each group's true cardinality
    val (a, b) = (df.where(col("k").substr(2, 10).cast("int") % 2 === 0),
      df.where(col("k").substr(2, 10).cast("int") % 2 === 1))
    val merged = Sketches.hllMergeBy(Seq("g"),
      Sketches.hllSketchBy(a, Seq("g"), "k"), Sketches.hllSketchBy(b, Seq("g"), "k"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(merged == grouped)
    val est = Sketches.hllEstimateBy(
        Sketches.hllSketchBy(df, Seq("g"), "k", b = 6), Seq("g"), b = 6)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = df.groupBy("g").agg(count_distinct(col("k")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n) / n < 0.35, s"group $g est ${est(g)} exact $n")
    }
  }

  test("consolidateSketch folds tranches to one with identical registers") {
    val dir = tempDir("graft_skcons")
    try {
      val a = (1 to 800).map(i => s"a$i").toDF("k")
      val b = (500 to 1500).map(i => s"a$i").toDF("k")
      val c = (1400 to 2000).map(i => s"a$i").toDF("k")
      Sketches.writeSketchTranche(Sketches.hllSketch(a, "k"), dir, "0")
      Sketches.writeSketchTranche(Sketches.hllSketch(b, "k"), dir, "1")
      Sketches.writeSketchTranche(Sketches.hllSketch(c, "k"), dir, "2")
      val before = Sketches.readSketch(spark, dir).collect()
        .map(r => r.getInt(0) -> r.getInt(1)).toMap
      Sketches.consolidateSketch(spark, dir)
      val fs = new java.io.File(dir).listFiles().filter(_.isDirectory)
        .map(_.getName).filter(_.startsWith("batch="))
      assert(fs.length == 1 && fs.head.startsWith("batch=consolidated-"))
      val after = Sketches.readSketch(spark, dir).collect()
        .map(r => r.getInt(0) -> r.getInt(1)).toMap
      assert(after == before)
      // replayed epoch tranche after consolidation is absorbed by the
      // register max, and a second consolidation folds it away again
      Sketches.writeSketchTranche(Sketches.hllSketch(b, "k"), dir, "1")
      assert(Sketches.readSketch(spark, dir).collect()
        .map(r => r.getInt(0) -> r.getInt(1)).toMap == before)
      Sketches.consolidateSketch(spark, dir)
      assert(Sketches.readSketch(spark, dir).collect()
        .map(r => r.getInt(0) -> r.getInt(1)).toMap == before)
      // idempotent no-op on a single-tranche artifact
      Sketches.consolidateSketch(spark, dir)
      assert(Sketches.readSketch(spark, dir).collect()
        .map(r => r.getInt(0) -> r.getInt(1)).toMap == before)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("day-keyed HLL artifact: rolling estimate from tranches ≡ inline, day-split + fold safe") {
    val dir = tempDir("graft_dayhll")
    try {
      def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-03-0$day%d 09:00:00")
      val rows = ((1 to 300).map(u => (ts(1), u.toLong)) ++
        (150 to 450).map(u => (ts(2), u.toLong)) ++
        (1 to 50).map(u => (ts(4), (u + 1000).toLong))).zipWithIndex
        .map { case ((t, u), i) => (t, u, i.toLong) }
      val df = rows.toDF("ts", "u", "i")
      // days straddle the two tranches; register max absorbs the split
      Sketches.writeDayHllTranche(df.where(col("i") % 2 === 0), "u", "ts", dir, "t0")
      Sketches.writeDayHllTranche(df.where(col("i") % 2 === 1), "u", "ts", dir, "t1")
      assertSameRows(
        Sketches.hllRollingFromIndex(spark, dir, 2),
        Sketches.hllRollingEstimate(df, "u", "ts", 2))
      // replay + plain max-rewrite fold: registers unchanged, one tranche
      Sketches.writeDayHllTranche(df.where(col("i") % 2 === 1), "u", "ts", dir, "t1")
      Sketches.consolidateDayHll(spark, dir)
      assert(new java.io.File(dir).listFiles()
        .map(_.getName).count(_.startsWith("batch=")) == 1)
      assertSameRows(
        Sketches.hllRollingFromIndex(spark, dir, 2),
        Sketches.hllRollingEstimate(df, "u", "ts", 2))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
