package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AlertsSpec extends SparkSpec {
  import spark.implicits._

  // series a: short spike (10-20s), long spike (40-70s); series b: never above
  private def series = Seq(
    (1L, "a", 0L, 1.0),
    (2L, "a", 10L, 9.0),
    (3L, "a", 20L, 9.5),
    (4L, "a", 30L, 2.0),   // breaks the first run
    (5L, "a", 40L, 8.0),
    (6L, "a", 50L, 8.5),
    (7L, "a", 60L, 9.0),
    (8L, "a", 70L, 9.9),
    (9L, "b", 0L, 3.0)
  ).toDF("event_id", "series", "sec", "value")
    .select(col("event_id"), col("series"), timestamp_seconds(col("sec")).as("ts"), col("value"))

  private def run(forSec: Long) =
    Alerts
      .thresholdFor(series, Seq("series"), "ts", "value", threshold = 5.0, forMicros = forSec * 1000000L, tieBreak = "event_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getTimestamp(2).getTime / 1000, r.getTimestamp(3).getTime / 1000, r.getLong(4), r.getBoolean(5))))
      .toMap

  test("runs split on below-threshold samples; only spans >= for fire") {
    val got = run(forSec = 25)
    assert(got.keySet == Set(("a", 1L), ("a", 2L)))
    assert(got(("a", 1L)) == ((10L, 20L, 2L, false))) // 10 s span < 25 s
    assert(got(("a", 2L)) == ((40L, 70L, 4L, true)))  // 30 s span
  }

  test("forMicros = 0 fires every run, including single samples") {
    val got = run(forSec = 0)
    assert(got.values.forall(_._4))
  }

  test("a series never above threshold produces no runs") {
    assert(!run(forSec = 0).keySet.exists(_._1 == "b"))
  }
}
