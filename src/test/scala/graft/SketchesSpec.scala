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
}
