package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RateLimitSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    // user u: a burst inside one hour, then the window slides past it
    (1L, "u", 0L),
    (2L, "u", 1000L),
    (3L, "u", 3599L),
    (4L, "u", 3600L), // second 0 now out of range [1, 3600]
    (5L, "u", 7200L), // alone in its trailing hour
    // user v: independent key
    (6L, "v", 3599L)
  ).toDF("event_id", "user_id", "sec")
    .select(col("event_id"), col("user_id"), timestamp_seconds(col("sec")).as("ts"))

  test("trailing-window counts slide correctly and breach at > limit") {
    val got = RateLimit
      .audit(events, "user_id", "ts", windowSec = 3600L, limit = 2L)
      .select("event_id", "n_in_window", "breach")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(got(1L) == ((1L, false)))
    assert(got(2L) == ((2L, false))) // at the limit, not over
    assert(got(3L) == ((3L, true)))
    assert(got(4L) == ((3L, true))) // event at sec 0 aged out, sec 1000/3599/3600 in
    assert(got(5L) == ((1L, false)))
    assert(got(6L) == ((1L, false))) // other user's burst is invisible
  }

  test("same-second ties count together via the RANGE frame (order-deterministic)") {
    val df = Seq((1L, "u", 5L), (2L, "u", 5L))
      .toDF("event_id", "user_id", "sec")
      .select(col("event_id"), col("user_id"), timestamp_seconds(col("sec")).as("ts"))
    val got = RateLimit
      .audit(df, "user_id", "ts", windowSec = 3600L, limit = 2L)
      .select("n_in_window")
      .collect()
      .map(_.getLong(0))
    assert(got.toSeq == Seq(2L, 2L)) // both rows see both events
  }
}
