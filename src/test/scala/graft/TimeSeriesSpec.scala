package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ext.TimeSeries

/** Time-series regularization: grid resampling, per-key gap fill,
  * LOCF, and linear interpolation — all per-key distributed (one
  * shuffle, partitioned windows, per-key `sequence()` grids).
  */
class TimeSeriesSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resample buckets onto the grid; gapFill densifies each key's " +
    "own span only; null slots appear where nothing was observed") {
    val obs = Seq(
      ("a", ts("2024-01-01 00:05:00"), 1.0),
      ("a", ts("2024-01-01 00:55:00"), 3.0), // same hour as the first
      ("a", ts("2024-01-01 03:10:00"), 8.0), // 2 missing hours before
      ("b", ts("2024-01-01 10:30:00"), 5.0)  // disjoint span from a's
    ).toDF("k", "t", "v")
    val res = TimeSeries.resample(obs, Seq("k"), "t", 3600,
      Seq(avg(col("v")).as("v")))
    val filled = TimeSeries.gapFill(res, Seq("k"), "bucket", 3600)
    val rows = filled.orderBy("k", "bucket")
      .select(col("k"), unix_timestamp(col("bucket")).as("b"), col("v"))
      .as[(String, Long, Option[Double])].collect().toSeq
    val h0 = ts("2024-01-01 00:00:00").getTime / 1000
    assert(rows === Seq(
      ("a", h0, Some(2.0)), ("a", h0 + 3600, None),
      ("a", h0 + 7200, None), ("a", h0 + 10800, Some(8.0)),
      ("b", h0 + 37800 - 1800, Some(5.0)))) // b: one 10:00 slot only
    // the guard trips on absurd spans
    intercept[IllegalArgumentException] {
      TimeSeries.gapFill(res, Seq("k"), "bucket", 3600, maxSlots = 2)
    }
  }

  test("locf carries the last observation forward per key; " +
    "interpolate fills linearly between observations and ONLY between") {
    val h0 = ts("2024-01-01 00:00:00")
    def slot(i: Int) = new Timestamp(h0.getTime + i * 3600000L)
    val filled = Seq(
      ("a", slot(0), Some(10.0)), ("a", slot(1), None),
      ("a", slot(2), None), ("a", slot(3), Some(40.0)),
      ("a", slot(4), None), // trailing gap: locf 40, interp null
      ("b", slot(0), None), // leading gap: both null
      ("b", slot(1), Some(7.0))
    ).toDF("k", "bucket", "v")
    val l = TimeSeries.locf(filled.withColumn("vi", col("v")),
      Seq("k"), "bucket", Seq("v"))
    val both = TimeSeries.interpolate(l, Seq("k"), "bucket", "vi")
    val rows = both.orderBy("k", "bucket")
      .select("k", "v", "vi")
      .as[(String, Option[Double], Option[Double])].collect().toSeq
    assert(rows === Seq(
      ("a", Some(10.0), Some(10.0)),
      ("a", Some(10.0), Some(20.0)), // interp: 10 + 30·(1/3)
      ("a", Some(10.0), Some(30.0)),
      ("a", Some(40.0), Some(40.0)),
      ("a", Some(40.0), None), // no next observation: not extrapolated
      ("b", None, None),       // no previous observation: stays null
      ("b", Some(7.0), Some(7.0))))
  }

  test("plan shape: the fills are PARTITIONED windows (no single-" +
    "partition global sort) and the grid is a per-key generator") {
    val obs = Seq(("a", ts("2024-01-01 00:00:00"), 1.0))
      .toDF("k", "t", "v")
    val res = TimeSeries.resample(obs, Seq("k"), "t", 3600,
      Seq(avg(col("v")).as("v")))
    val plan = TimeSeries.locf(
      TimeSeries.gapFill(res, Seq("k"), "bucket", 3600),
      Seq("k"), "bucket", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.matches("(?s).*Window \\[[^\\]]*\\bwindowspecdefinition\\(\\s*\\btimestamp.*"),
      "window must carry a partitionBy")
    // the textual spec must show the key in the partition clause
    assert(plan.contains("windowspecdefinition(k#") ||
      plan.contains("windowspecdefinition(k "),
      s"expected key-partitioned window in:\n$plan")
  }
}
