package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FlapSpec extends SparkSpec {
  import spark.implicits._

  test("transition counting: first row free, crossings counted, threshold gates") {
    val df = Seq(
      // series a: states T F F T -> 2 transitions
      (1L, "a", 0L, 150.0),
      (2L, "a", 10L, 50.0),
      (3L, "a", 20L, 60.0),
      (4L, "a", 30L, 200.0),
      // series b: all below -> 0 transitions
      (5L, "b", 0L, 10.0),
      (6L, "b", 10L, 20.0),
      // series c: alternates every step -> 3 transitions > threshold 2
      (7L, "c", 0L, 150.0),
      (8L, "c", 10L, 50.0),
      (9L, "c", 20L, 150.0),
      (10L, "c", 30L, 50.0)
    ).toDF("event_id", "series", "sec", "value")
      .select(
        col("event_id"),
        col("series"),
        timestamp_seconds(col("sec")).as("ts"),
        col("value")
      )

    val got = Flap
      .transitions(df, Seq("series"), "ts", "event_id", col("value") > 100.0, flapThreshold = 2L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap

    assert(got("a") == ((4L, 2L, false)))
    assert(got("b") == ((2L, 0L, false)))
    assert(got("c") == ((4L, 3L, true)))
  }
}
