package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SeasonalSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L
  private val Week = 168L * H

  test("hourOfWeek is the epoch-hour index mod 168, stable across weeks") {
    val got = Seq(0L, 1L * H, 167L * H, Week, Week + 5 * H, 3 * Week + 167 * H)
      .toDF("sec")
      .select(Seasonal.hourOfWeek(timestamp_seconds(col("sec"))).as("how"))
      .collect()
      .map(_.getLong(0))
    assert(got.toSeq == Seq(0L, 1L, 167L, 0L, 5L, 167L))
  }

  test("baseline: exact per-(series, weekly-hour) means across weeks") {
    // series a at weekly hour 3: values 10 (week 0) and 20 (week 1)
    val events = Seq(
      ("a", 3 * H, 10.0), ("a", Week + 3 * H, 20.0),
      ("a", 4 * H, 7.0),
      ("b", 3 * H, 100.0)
    ).toDF("series", "sec", "value")
      .select(col("series"), timestamp_seconds(col("sec")).as("ts"), col("value"))
    val got = Seasonal
      .baseline(events, "series", "ts", "value")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == Map(
      ("a", 3L) -> ((2L, 15.0)),
      ("a", 4L) -> ((1L, 7.0)),
      ("b", 3L) -> ((1L, 100.0))
    ))
  }

  test("anomalies: residual vs own-slot baseline, threshold gates, broadcast join") {
    val H = 3600L
    // slot 3 of series a: values 10 and 20 -> mean 15; residual ±5
    // slot 4 of series a: values 7 and 100 -> mean 53.5; residual ±46.5
    val events = Seq(
      (1L, "a", 3 * H, 10.0),
      (2L, "a", 3 * H + 60, 20.0),
      (3L, "a", 4 * H, 7.0),
      (4L, "a", 4 * H + 60, 100.0)
    ).toDF("event_id", "series", "sec", "value")
      .select(col("event_id"), col("series"), timestamp_seconds(col("sec")).as("ts"), col("value"))
    val got = Seasonal
      .anomalies(events, "series", "ts", "value", threshold = 40.0)
      .select("event_id", "expected", "residual")
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    assert(got == Map(3L -> ((53.5, -46.5)), 4L -> ((53.5, 46.5))))
  }
}
