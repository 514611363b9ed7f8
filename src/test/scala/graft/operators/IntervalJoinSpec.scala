package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def iv = Seq(
    // user 1: [0, 100] and [200, 300]; user 2: [50, 60]
    (10L, 1L, 0L, 100L),
    (11L, 1L, 200L, 300L),
    (12L, 2L, 50L, 60L)
  ).toDF("iv_id", "user_id", "s", "e")
    .select(
      col("iv_id"),
      col("user_id"),
      timestamp_seconds(col("s")).as("start_ts"),
      timestamp_seconds(col("e")).as("end_ts")
    )

  private def pts = Seq(
    (1L, 1L, 0L),    // boundary: start inclusive
    (2L, 1L, 100L),  // boundary: end inclusive
    (3L, 1L, 150L),  // in no interval
    (4L, 1L, 250L),
    (5L, 2L, 55L),
    (6L, 2L, 250L)   // right key, wrong time
  ).toDF("event_id", "user_id", "sec")
    .select(col("event_id"), col("user_id"), timestamp_seconds(col("sec")).as("ts"))

  test("overlap: containment with inclusive bounds, per key, exactly once per pair") {
    val got = IntervalJoin
      .overlap(iv, pts, Seq("user_id"), "start_ts", "end_ts", "ts", epochSeconds = 60)
      .select("iv_id", "event_id")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toSet
    assert(got == Set(10L -> 1L, 10L -> 2L, 11L -> 4L, 12L -> 5L))
  }

  test("epoch width does not change results, only replication") {
    val a = IntervalJoin
      .overlap(iv, pts, Seq("user_id"), "start_ts", "end_ts", "ts", epochSeconds = 7)
      .select("iv_id", "event_id")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toSet
    val b = IntervalJoin
      .overlap(iv, pts, Seq("user_id"), "start_ts", "end_ts", "ts", epochSeconds = 100000)
      .select("iv_id", "event_id")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toSet
    assert(a == b)
  }

  test("over-wide intervals fail loudly instead of fanning out") {
    val err = intercept[Exception] {
      IntervalJoin
        .overlap(iv, pts, Seq("user_id"), "start_ts", "end_ts", "ts", epochSeconds = 1, maxEpochsPerRow = 50)
        .collect()
    }
    assert(err.getMessage != null && err.getMessage.contains("IntervalJoin"), err.getMessage)
  }

  test("plan: equi-join (hash/sort-merge), never a nested-loop cartesian") {
    val plan = IntervalJoin
      .overlap(iv, pts, Seq("user_id"), "start_ts", "end_ts", "ts", epochSeconds = 60)
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }
}
