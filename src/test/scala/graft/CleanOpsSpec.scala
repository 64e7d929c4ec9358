package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.clean.CleanOps

/** FIXTURES.md §B.1 dirty_strings + §B.2 old_dates. */
class CleanOpsSpec extends SparkSpec {
  import spark.implicits._

  private def dirty = Seq(
    (1, "", "2021-03-01 10:11:12.123456", "", "plain"),
    (2, "nan", "not a date", "nan", "é→ë mixed"),
    (3, "NULL", "2021-03-01 10:11:12", "NaN", "ascii"),
    (4, "1.5", "", "NaT", ""),
    (5, "42", "1999-12-31 23:59:59.9", " ", "ünïcødé"),
    (6, null, null, null, null)
  ).toDF("id", "s_int", "s_ts", "s_nan", "s_ascii")

  test("nanToNull nulls nan/null/empty after trim+lower, keeps the rest") {
    val out = CleanOps.nanToNull(dirty, Seq("s_int")).select("id", "s_int").as[(Int, Option[String])].collect().toMap
    assert(out(1).isEmpty && out(2).isEmpty && out(3).isEmpty)
    assert(out(4).contains("1.5") && out(5).contains("42") && out(6).isEmpty)
  }

  test("nanToNull defaults to all string columns") {
    val out = CleanOps.nanToNull(dirty)
    assert(out.where(col("s_nan") === "nan").count() == 0)
    assert(out.where(col("s_ascii") === "").count() == 0)
  }

  test("emptyAndNanToNull nulls pandas missing tokens and NaN doubles") {
    val df = Seq((1, Double.NaN, "NaT"), (2, 2.5, "ok"), (3, 0.0, "  ")).toDF("id", "d", "s")
    val out = CleanOps.emptyAndNanToNull(df)
    assert(out.where(col("d").isNull).select("id").as[Int].collect().toSet == Set(1))
    assert(out.where(col("s").isNull).select("id").as[Int].collect().toSet == Set(1, 3))
  }

  test("stringToInt: lenient, truncating, junk→null (SURVEY §7.5.3)") {
    val out = CleanOps.stringToInt(dirty, Seq("s_int"))
      .select("id", "s_int").as[(Int, Option[Int])].collect().toMap
    assert(out(1).isEmpty)       // ""
    assert(out(2).isEmpty)       // "nan" → try_cast double gives NaN → int? ensure null or value
    assert(out(4).contains(1))   // "1.5" truncates
    assert(out(5).contains(42))
    assert(out(6).isEmpty)
  }

  test("stringToTimestamp strips fractional tail, junk→null") {
    val out = CleanOps.stringToTimestamp(dirty, Seq("s_ts"))
      .select("id", "s_ts").collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(out(1).exists(_.toString == "2021-03-01T10:11:12"))
    assert(out(2).isEmpty)
    assert(out(3).exists(_.toString == "2021-03-01T10:11:12"))
    assert(out(5).exists(_.toString == "1999-12-31T23:59:59"))
  }

  test("asciiFold drops non-ascii, keeps ascii") {
    val out = CleanOps.asciiFold(dirty, Seq("s_ascii"))
      .select("id", "s_ascii").as[(Int, Option[String])].collect().toMap
    assert(out(2).contains(" mixed"))
    assert(out(3).contains("ascii"))
    assert(out(5).contains("ncd")) // ü,ï,ø,é dropped; ascii n,c,d kept
  }

  test("cleanOldDates clamps pre-1900 (incl. pre-1582) to 1900-01-01") {
    val df = Seq(
      (1, "1581-01-01 00:00:00"), (2, "1899-12-31 23:59:59"),
      (3, "1900-01-01 00:00:00"), (4, "2020-06-15 12:00:00"))
      .toDF("id", "ts").withColumn("ts", col("ts").cast(TimestampNTZType))
    val out = CleanOps.cleanOldDates(df, Seq("ts"))
      .select("id", "ts").collect().map(r => r.getInt(0) -> r.get(1).toString).toMap
    assert(out(1) == "1900-01-01T00:00")
    assert(out(2) == "1900-01-01T00:00")
    assert(out(3) == "1900-01-01T00:00")
    assert(out(4) == "2020-06-15T12:00")
  }

  test("sentinelTimestamps: NULL → 1111-01-01 so upsert keys compare") {
    val df = Seq((1, Some("2020-01-01 00:00:00")), (2, None))
      .toDF("id", "ts").withColumn("ts", col("ts").cast(TimestampNTZType))
    val out = CleanOps.sentinelTimestamps(df, Seq("ts"))
    assert(out.where(col("ts").isNull).count() == 0)
    assert(out.where(col("id") === 2).select("ts").head().get(0).toString.startsWith("1111-01-01"))
  }

  test("floatToInt truncates toward zero like Python int()") {
    val df = Seq((1, Some(3.9)), (2, Some(-3.9)), (3, None)).toDF("id", "v")
    val out = CleanOps.floatToInt(df, Seq("v")).select("id", "v").as[(Int, Option[Int])].collect().toMap
    assert(out(1).contains(3) && out(2).contains(-3) && out(3).isEmpty)
  }
}
