package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ev = Seq(
    // user 1: events at 0, 10, 100, 1000 s with a 60 s gap -> sessions
    // {0,10}, {100 is 90 s after 10 -> new}, {1000 -> new}
    (1L, 1L, 0L, 1.0),
    (2L, 1L, 10L, 2.0),
    (3L, 1L, 100L, 3.0),
    (4L, 1L, 1000L, 4.0),
    // user 2: single event
    (5L, 2L, 7L, 5.0)
  ).toDF("event_id", "user_id", "sec", "value")
    .select(col("event_id"), col("user_id"), timestamp_seconds(col("sec")).as("ts"), col("value"))

  test("sessionize: gap splits, 1-based per-key numbering") {
    val got = Sessionize
      .sessionize(ev, Seq("user_id"), "ts", gapMicros = 60L * 1000000, tieBreak = "event_id")
      .select("event_id", "session_idx")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 1L))
  }

  test("sessions: per-session start/end/count + extra aggregates") {
    val got = Sessionize
      .sessions(
        ev,
        Seq("user_id"),
        "ts",
        gapMicros = 60L * 1000000,
        tieBreak = "event_id",
        extraAggs = Seq(sum("value").as("v"))
      )
      .select("user_id", "session_idx", "n_events", "v")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got((1L, 1L)) == ((2L, 3.0)))
    assert(got((1L, 2L)) == ((1L, 3.0)))
    assert(got((1L, 3L)) == ((1L, 4.0)))
    assert(got((2L, 1L)) == ((1L, 5.0)))
  }

  test("equal timestamps order by the tie-break, so numbering is reproducible") {
    val tie = Seq((10L, 1L, 0L), (11L, 1L, 0L), (12L, 1L, 120L))
      .toDF("event_id", "user_id", "sec")
      .select(col("event_id"), col("user_id"), timestamp_seconds(col("sec")).as("ts"))
    val got = Sessionize
      .sessionize(tie, Seq("user_id"), "ts", gapMicros = 60L * 1000000, tieBreak = "event_id")
      .select("event_id", "session_idx")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == Map(10L -> 1L, 11L -> 1L, 12L -> 2L))
  }

  test("plan: the lag-diff and running-sum windows share one exchange + sort") {
    val plan = Sessionize
      .sessionize(ev, Seq("user_id"), "ts", gapMicros = 60L * 1000000, tieBreak = "event_id")
      .queryExecution
      .executedPlan
      .toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }
}
