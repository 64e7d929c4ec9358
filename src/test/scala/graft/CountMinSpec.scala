package graft

import org.apache.spark.sql.functions._

import graft.profile.CountMin

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def lookupMap(sketch: org.apache.spark.sql.DataFrame,
                        keys: Seq[String]) =
    CountMin.cmLookup(sketch, keys.toDF("k"), "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("estimates never undercount and are exact without collisions") {
    // 20 keys into an 8192-wide grid: collisions essentially impossible
    // per row, so all four row estimates equal the true count
    val rows = (1 to 20).flatMap(i => Seq.fill(i)(s"key_$i"))
    val sk = CountMin.cmSketch(rows.toDF("k"), "k")
    val got = lookupMap(sk, (1 to 20).map(i => s"key_$i"))
    (1 to 20).foreach(i => assert(got(s"key_$i") == i.toLong, s"key_$i"))
    // an unseen key with empty cells estimates 0
    assert(lookupMap(sk, Seq("never_seen"))("never_seen") == 0L)
  }

  test("under heavy collision pressure estimates dominate true counts") {
    // 3000 distinct keys into a 64-wide grid: every cell is shared
    val rows = (1 to 9000).map(i => s"k${i % 3000}")
    val sk = CountMin.cmSketch(rows.toDF("k"), "k", width = 64, depth = 4)
    assert(sk.count() <= 64 * 4)
    val probe = (0 until 50).map(i => s"k$i")
    val got = CountMin.cmLookup(sk, probe.toDF("k"), "k", width = 64, depth = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every key occurs exactly 3 times; estimates must be ≥ 3 always
    probe.foreach(k => assert(got(k) >= 3L, s"$k undercounted: ${got(k)}"))
    // and the min-of-rows must tighten vs a single row's expected cell
    // load (9000/64 ≈ 141): the deterministic draw averages ~124
    val avg = got.values.sum.toDouble / got.size
    assert(avg < 135.0, s"min-of-rows not tightening: avg $avg")
  }

  test("merge of disjoint halves == sketch of the union, cell-exact") {
    val a = (1 to 2000).map(i => s"x${i % 313}").toDF("k")
    val b = (1 to 1500).map(i => s"x${i % 521}").toDF("k")
    val whole = CountMin.cmSketch(a.unionByName(b), "k")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val merged = CountMin.cmMerge(CountMin.cmSketch(a, "k"), CountMin.cmSketch(b, "k"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("at-rest grid: tranches merge on read, replay converges") {
    val dir = tempDir("graft_cm")
    try {
      val a = (1 to 1200).map(i => s"t${i % 211}").toDF("k")
      val b = (1 to 800).map(i => s"t${i % 379}").toDF("k")
      val expected = CountMin.cmSketch(a.unionByName(b), "k")
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      CountMin.writeCmTranche(CountMin.cmSketch(a, "k"), dir, "d0")
      CountMin.writeCmTranche(CountMin.cmSketch(b, "k"), dir, "d1")
      def readMap() = CountMin.readCm(spark, dir)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(readMap() == expected)
      // re-delivered ingest overwrites its own tranche → unchanged
      CountMin.writeCmTranche(CountMin.cmSketch(b, "k"), dir, "d1")
      assert(readMap() == expected)
      CountMin.consolidateCm(spark, dir)
      assert(readMap() == expected)
      val names = new java.io.File(dir).listFiles().filter(_.isDirectory)
        .map(_.getName).filter(_.startsWith("batch="))
      assert(names.length == 1 && names.head.startsWith("batch=consolidated-"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("cmJoinSize: never undercounts the true inner product, exact when collision-free") {
    // a: keys x(3), y(2); b: keys x(4), z(5) -> true join size 3*4 = 12
    val a = (Seq.fill(3)("x") ++ Seq.fill(2)("y")).toDF("k")
    val b = (Seq.fill(4)("x") ++ Seq.fill(5)("z")).toDF("k")
    val est = CountMin.cmJoinSize(CountMin.cmSketch(a, "k"), CountMin.cmSketch(b, "k"))
      .head.getDouble(0)
    assert(est >= 12.0)
    // 3 keys in 8192-wide rows: collisions essentially impossible -> exact
    assert(est == 12.0, s"unexpected collision inflation: $est")
  }

  test("cmJoinSize: disjoint key sets estimate 0; sketch-vs-self estimates sum of squares") {
    val a = Seq("p", "q").toDF("k")
    val b = Seq("r", "s").toDF("k")
    val zero = CountMin.cmJoinSize(CountMin.cmSketch(a, "k"), CountMin.cmSketch(b, "k"))
      .head.getDouble(0)
    assert(zero == 0.0)
    val c = (Seq.fill(3)("u") ++ Seq.fill(4)("v")).toDF("k")
    val self = CountMin.cmSketch(c, "k")
    assert(CountMin.cmJoinSize(self, self).head.getDouble(0) == 25.0) // 9 + 16
  }

  test("cmJoinSize over merged at-rest grids equals over the one-shot sketch") {
    val d1 = (1 to 300).map(i => s"k${i % 37}").toDF("k")
    val d2 = (1 to 200).map(i => s"k${i % 53}").toDF("k")
    val probe = (1 to 100).map(i => s"k${i % 41}").toDF("k")
    val merged = CountMin.cmMerge(CountMin.cmSketch(d1, "k"), CountMin.cmSketch(d2, "k"))
    val oneShot = CountMin.cmSketch(d1.unionByName(d2), "k")
    val pb = CountMin.cmSketch(probe, "k")
    assert(CountMin.cmJoinSize(merged, pb).head.getDouble(0)
      == CountMin.cmJoinSize(oneShot, pb).head.getDouble(0))
  }
}
