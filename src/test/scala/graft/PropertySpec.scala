package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.clean.CleanOps
import graft.merge.Merge
import graft.relational.RelationalOps
import graft.schema.SchemaOps

/** Property-based laws (SURVEY.md §5): upsert idempotency, union-drift,
  * lenient-cast totality, schema-apply closure. Raw ScalaCheck driven
  * through Test.check (no scalatestplus bridge in the build).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), prop)
    assert(res.passed, s"$name: $res")
  }

  private val kvGen: Gen[List[(Int, Int)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0, 9), Gen.choose(0, 100)))

  test("upsert idempotency: upsert(upsert(t,s),s) == upsert(t,s)") {
    check("upsert-idempotent", Prop.forAll(kvGen, kvGen) { (t, s) =>
      val target = t.toDF("k", "v")
      val stage = s.distinctBy(_._1).toDF("k", "v") // stage keys unique (staging contract)
      val once = Merge.upsertFrame(target, stage, Seq("k"))
      val twice = Merge.upsertFrame(once, stage, Seq("k"))
      once.collect().toSet == twice.collect().toSet
    }, n = 10)
  }

  test("upsert result: stage keys have stage values; non-stage rows untouched") {
    check("upsert-semantics", Prop.forAll(kvGen, kvGen) { (t, s) =>
      val target = t.toDF("k", "v")
      val stage = s.distinctBy(_._1).toDF("k", "v")
      val out = Merge.upsertFrame(target, stage, Seq("k")).as[(Int, Int)].collect()
      val stageMap = s.distinctBy(_._1).toMap
      val expected = t.filterNot(r => stageMap.contains(r._1)) ++ stageMap.toList
      out.toSet == expected.toSet && out.length == expected.length
    }, n = 10)
  }

  test("uniteByName: row counts add, missing columns null-fill, column union") {
    val colsGen = Gen.someOf("a", "b", "c").suchThat(_.nonEmpty)
    check("union-drift", Prop.forAll(colsGen, colsGen) { (c1, c2) =>
      def mk(cs: Seq[String]) =
        Seq.fill(3)(cs.map(_ => 1)).map {
          case Seq(x) => Tuple1(x); case Seq(x, y) => (x, y); case Seq(x, y, z) => (x, y, z)
        } match {
          case rows: Seq[_] if cs.size == 1 => rows.asInstanceOf[Seq[Tuple1[Int]]].toDF(cs: _*)
          case rows if cs.size == 2 => rows.asInstanceOf[Seq[(Int, Int)]].toDF(cs: _*)
          case rows => rows.asInstanceOf[Seq[(Int, Int, Int)]].toDF(cs: _*)
        }
      val (d1, d2) = (mk(c1.toSeq), mk(c2.toSeq))
      val u = RelationalOps.uniteByName(Seq(d1, d2))
      u.count() == 6 && u.columns.toSet == (c1.toSet ++ c2.toSet)
    }, n = 10)
  }

  test("stringToInt is total: never throws, junk → null, integral strings roundtrip") {
    val strGen = Gen.oneOf(
      Gen.alphaNumStr, Gen.numStr.map(_.take(8)),
      Gen.oneOf("", "nan", "NaN", "Infinity", "-Infinity", "1.5", "-3.9", " 42 "))
    check("string-to-int-total", Prop.forAll(Gen.listOfN(20, strGen)) { ss =>
      val out = CleanOps.stringToInt(ss.toDF("s"), Seq("s")).collect()
      out.length == ss.length // no throw, one row per input
    }, n = 15)
  }

  test("applySchema closure: output schema is exactly the target schema") {
    val schemaGen = Gen.someOf(
      StructField("a", IntegerType), StructField("b", StringType),
      StructField("x", DoubleType), StructField("t", TimestampNTZType)
    ).suchThat(_.nonEmpty).map(fs => StructType(fs.toSeq))
    check("apply-schema-closure", Prop.forAll(schemaGen) { target =>
      val df = Seq(("1", "s", "bad")).toDF("a", "b", "other")
      SchemaOps.applySchema(df, target).schema == target
    }, n = 15)
  }

  test("explode/collect roundtrip preserves the multiset") {
    val arrGen = Gen.listOfN(5, Gen.listOf(Gen.choose(0, 20)).map(_.take(6)))
    check("explode-roundtrip", Prop.forAll(arrGen) { arrs =>
      val df = arrs.zipWithIndex.map { case (a, i) => (i, a) }.toDF("id", "arr")
      val back = df.select(col("id"), explode(col("arr")).as("v"))
        .groupBy("id").agg(sort_array(collect_list(col("v"))).as("arr"))
        .as[(Int, Seq[Int])].collect().toMap
      arrs.zipWithIndex.forall { case (a, i) =>
        back.getOrElse(i, Nil) == a.sorted // empty arrays vanish on explode (inner)
      }
    }, n = 10)
  }
}
