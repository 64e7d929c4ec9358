package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.analytics.TimeSeriesOps

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resampleFill: dense grid per key, LOCF fill, src flags") {
    val df = Seq(
      (1L, ts("2024-01-01 00:10:00"), 100L, 1.0),
      (1L, ts("2024-01-01 03:20:00"), 101L, 4.0),
      (2L, ts("2024-01-01 05:00:00"), 102L, 9.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeriesOps.resampleFill(df, "user_id", "ts", "value", "event_id", 3600L)
      .orderBy("user_id", "bucket_ts").collect()
    // key 1: buckets 00,01,02,03 — 4 rows; key 2: single bucket
    assert(out.length == 5)
    val k1 = out.take(4)
    assert(k1.map(_.getAs[Double]("value")).toSeq == Seq(1.0, 1.0, 1.0, 4.0))
    assert(k1.map(_.getAs[String]("src")).toSeq == Seq("obs", "fill", "fill", "obs"))
    val b0 = k1(0).getAs[Long]("bucket_ts")
    assert(b0 % 3600 == 0)
    assert(k1.map(_.getAs[Long]("bucket_ts") - b0).toSeq == Seq(0L, 3600L, 7200L, 10800L))
    assert(out(4).getAs[String]("src") == "obs" && out(4).getAs[Double]("value") == 9.0)
  }

  test("resampleFill: last observation in a bucket wins, ties by tie column") {
    val df = Seq(
      (1L, ts("2024-01-01 00:05:00"), 1L, 10.0),
      (1L, ts("2024-01-01 00:45:00"), 2L, 20.0),
      (1L, ts("2024-01-01 00:45:00"), 3L, 30.0) // same ts — higher id wins
    ).toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeriesOps.resampleFill(df, "user_id", "ts", "value", "event_id", 3600L)
      .collect()
    assert(out.length == 1 && out(0).getAs[Double]("value") == 30.0
      && out(0).getAs[String]("src") == "obs")
  }

  test("resampleFill: null-valued winner marks fill and inherits the prior value") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, Some(5.0)),
      (1L, ts("2024-01-01 01:00:00"), 2L, None: Option[Double])
    ).toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeriesOps.resampleFill(df, "user_id", "ts", "value", "event_id", 3600L)
      .orderBy("bucket_ts").collect()
    assert(out.length == 2)
    assert(out(1).getAs[String]("src") == "fill" && out(1).getAs[Double]("value") == 5.0)
  }

  test("rollingAgg: trailing-row sums/avgs per key, partial head windows") {
    val df = Seq((1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 3.0), (1L, 4L, 4.0),
      (2L, 1L, 10.0)).toDF("user_id", "bucket_ts", "value")
    val out = TimeSeriesOps.rollingAgg(df, "user_id", "bucket_ts", "value", nRows = 3)
      .orderBy("user_id", "bucket_ts").collect()
    assert(out.map(_.getAs[Double]("roll_sum")).toSeq == Seq(1.0, 3.0, 6.0, 9.0, 10.0))
    assert(out.map(_.getAs[Long]("roll_n")).toSeq == Seq(1L, 2L, 3L, 3L, 1L))
    assert(math.abs(out(3).getAs[Double]("roll_avg") - 3.0) < 1e-12)
  }

  test("rollingAgg over the resampled grid: fills participate in the window") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 6.0),
      (1L, ts("2024-01-01 02:00:00"), 2L, 12.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val grid = TimeSeriesOps.resampleFill(df, "user_id", "ts", "value", "event_id", 3600L)
    val out = TimeSeriesOps.rollingAgg(grid, "user_id", "bucket_ts", "value", nRows = 2)
      .orderBy("bucket_ts").collect()
    // grid values: 6 (obs), 6 (fill), 12 (obs) -> trailing-2 sums 6, 12, 18
    assert(out.map(_.getAs[Double]("roll_sum")).toSeq == Seq(6.0, 12.0, 18.0))
  }

  test("resampleFill rejects nonpositive steps") {
    val df = Seq((1L, ts("2024-01-01 00:00:00"), 1L, 1.0))
      .toDF("user_id", "ts", "event_id", "value")
    intercept[IllegalArgumentException] {
      TimeSeriesOps.resampleFill(df, "user_id", "ts", "value", "event_id", 0L)
    }
  }
}
