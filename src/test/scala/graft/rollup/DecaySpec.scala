package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecaySpec extends SparkSpec {
  import spark.implicits._

  private val Day = 86400L

  // as-of = day 2. key a: 1 event today (w=1), 2 yesterday (w=0.5 each),
  // 1 two days ago (w=0.25) -> score 2.25; key b: only an event beyond
  // the horizon -> dropped entirely
  private def events = Seq(
    ("a", 2 * Day + 10),
    ("a", 1 * Day + 10), ("a", 1 * Day + 20),
    ("a", 0 * Day + 10),
    ("b", 2 * Day + 30), // keeps the as-of anchored via key b too
    ("c", 0L)
  ).toDF("k", "sec")
    .select(col("k"), timestamp_seconds(col("sec")).as("ts"))

  test("one-day half-life decay: exact power-of-two weights") {
    val got = Decay
      .decayedCounts(events, Seq("k"), "ts", horizonDays = 30)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val u = 1L << 30
    assert(got("a") == ((4L, u + u / 2 + u / 2 + u / 4, 2.25)))
    assert(got("b") == ((1L, u, 1.0)))
    // c is 2 days old: weight 0.25, still inside the horizon
    assert(got("c") == ((1L, u / 4, 0.25)))
  }

  test("events beyond the horizon are dropped") {
    val far = Seq(("z", 40L * Day), ("z", 0L))
      .toDF("k", "sec")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"))
    val got = Decay
      .decayedCounts(far, Seq("k"), "ts", horizonDays = 30)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(got == Map("z" -> 1L)) // only the as-of-day event survives
  }

  test("horizon bounds are enforced") {
    intercept[IllegalArgumentException] {
      Decay.decayedCounts(events, Seq("k"), "ts", horizonDays = 0)
    }
    intercept[IllegalArgumentException] {
      Decay.decayedCounts(events, Seq("k"), "ts", horizonDays = 63)
    }
  }
}
