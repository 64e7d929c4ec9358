package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.nested.NestedOps

/** FIXTURES.md §B.4 nested_orders. */
class NestedOpsSpec extends SparkSpec {
  import spark.implicits._

  test("flattenStruct promotes struct fields") {
    val df = Seq((1, ("a", 2))).toDF("id", "payload")
    val out = NestedOps.flattenStruct(df, "payload")
    assert(out.columns.toSeq == Seq("id", "_1", "_2"))
    assert(out.head() == org.apache.spark.sql.Row(1, "a", 2))
  }

  test("explodeColumn on arrays keeps NULL/empty rows (explode_outer)") {
    val df = Seq(
      (1, Seq("a", "b")), (2, Seq.empty[String]), (3, null.asInstanceOf[Seq[String]])
    ).toDF("id", "arr")
    val out = NestedOps.explodeColumn(df, "arr")
    assert(out.count() == 4) // a, b, null-for-empty, null-for-null
    assert(out.where(col("id") === 2).head().isNullAt(1))
  }

  test("explodeColumn parses stringified lists \"['a1', 'b2']\"") {
    val df = Seq((1, "['a1', 'b2', 'c3']"), (2, "[]"), (3, "[x]")).toDF("id", "s")
    val out = NestedOps.explodeColumn(df, "s")
    val byId = out.collect().groupBy(_.getInt(0)).view.mapValues(_.map(r => Option(r.get(1))).toSeq).toMap
    assert(byId(1).flatten == Seq("'a1'", "'b2'", "'c3'"))
    assert(byId(2) == Seq(None)) // empty list → NULL row kept
    assert(byId(3).flatten == Seq("x"))
  }

  test("explodeColumn rejects non-array/string columns") {
    intercept[IllegalArgumentException] {
      NestedOps.explodeColumn(Seq((1, 2)).toDF("id", "n"), "n")
    }
  }

  test("filterEmptyFromArray drops elements whose nested array is empty") {
    val df = spark.sql(
      """SELECT 1 AS id, array(
        |  named_struct('price', 1.0, 'tags', array('a')),
        |  named_struct('price', 2.0, 'tags', cast(array() as array<string>))) AS items""".stripMargin)
    val out = NestedOps.filterEmptyFromArray(df, "items", "tags")
    assert(out.select(size(col("items"))).head().getInt(0) == 1)
  }

  test("argMaxInArray keeps the max element; empty/null arrays → NULL") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1, array(named_struct('v', 1, 'ver', 3), named_struct('v', 9, 'ver', 7), named_struct('v', 5, 'ver', 5))),
        |  (2, cast(array() as array<struct<v:int,ver:int>>)),
        |  (3, cast(null as array<struct<v:int,ver:int>>))
        |AS t(id, items)""".stripMargin)
    val out = NestedOps.argMaxInArray(df, "items", "ver")
    val m = out.collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(m(1).map(_.toString).contains("[9,7]"))
    assert(m(2).isEmpty && m(3).isEmpty)
  }

  test("parseJsonInferred infers schema from sample then parses all rows") {
    val df = Seq((1, """{"k": 1, "s": "a"}"""), (2, """{"k": 2, "s": "b"}""")).toDF("id", "j")
    val out = NestedOps.parseJsonInferred(spark, df, "j")
    assert(out.select(col("j.k")).as[Long].collect().toSet == Set(1L, 2L))
  }

  test("toJsonParams serializes whole rows to JSON strings") {
    val df = Seq((1, "x")).toDF("a", "b")
    assert(NestedOps.toJsonParams(df).as[String].head() == """{"a":1,"b":"x"}""")
  }
}
