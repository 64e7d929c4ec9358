package graft

import org.apache.spark.sql.functions._
import graft.analytics.ExperimentOps

class ExperimentOpsSpec extends SparkSpec {
  import spark.implicits._

  private def units(g: String, arm: String, n: Int, conv: Int) =
    (1 to n).map(i => (g, arm, i <= conv))

  test("twoProportionTest: clear lift significant, tiny lift not, hand-checked boundary") {
    // g1: 100 vs 100 units, 50% vs 10% -> wildly significant at z=2
    // g2: 100 vs 100, 20% vs 22% -> not significant
    val df = (units("g1", "a", 100, 50) ++ units("g1", "b", 100, 10) ++
      units("g2", "a", 100, 20) ++ units("g2", "b", 100, 22))
      .toDF("grp", "arm", "ok")
    val out = ExperimentOps.twoProportionTest(df, "grp", "arm", "ok")
      .collect().map(r => r.getString(0) -> r.getAs[Boolean]("significant")).toMap
    assert(out == Map("g1" -> true, "g2" -> false))
  }

  test("twoProportionTest: exact integer boundary agrees with the float z-test") {
    // replicate the float z-test on a grid and compare verdicts
    for (cA <- Seq(10, 30, 50); cB <- Seq(10, 30, 50); if cA != cB) {
      val nA = 200; val nB = 150
      val df = (units("g", "a", nA, cA) ++ units("g", "b", nB, cB))
        .toDF("grp", "arm", "ok")
      val got = ExperimentOps.twoProportionTest(df, "grp", "arm", "ok")
        .head.getAs[Boolean]("significant")
      val p = (cA + cB).toDouble / (nA + nB)
      val zFloat = math.abs(cA.toDouble / nA - cB.toDouble / nB) /
        math.sqrt(p * (1 - p) * (1.0 / nA + 1.0 / nB))
      assert(got == (zFloat > 2.0), s"cA=$cA cB=$cB z=$zFloat")
    }
  }

  test("twoProportionTest: missing arm is no-evidence false; other arms ignored; counts carried") {
    val df = (units("solo", "a", 50, 25) ++ units("full", "a", 40, 20) ++
      units("full", "b", 40, 2) ++ Seq(("full", "c", true)))
      .toDF("grp", "arm", "ok")
    val rows = ExperimentOps.twoProportionTest(df, "grp", "arm", "ok")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getAs[Boolean]("significant")))).toMap
    assert(rows("solo") == ((50L, 25L, 0L, 0L, false)))
    assert(rows("full") == ((40L, 20L, 40L, 2L, true)))
    intercept[IllegalArgumentException] {
      ExperimentOps.twoProportionTest(df, "grp", "arm", "ok", armA = "x", armB = "x")
    }
  }
}
