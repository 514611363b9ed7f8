package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RateOpsSpec extends SparkSpec {
  import spark.implicits._

  // one counter series: grows 0 -> 10 -> 25, resets (25 -> 4), grows to 9;
  // second series entirely inside one minute
  private def counters = Seq(
    (1L, "a", 0L, 0.0),
    (2L, "a", 30L, 10.0),
    (3L, "a", 70L, 25.0),   // next minute: delta 15 lands in bucket 60
    (4L, "a", 100L, 4.0),   // reset: contributes 4, bucket 60
    (5L, "a", 130L, 9.0),   // delta 5, bucket 120
    (6L, "b", 10L, 7.0)     // single sample: null delta
  ).toDF("event_id", "series", "sec", "value")
    .select(col("event_id"), col("series"), timestamp_seconds(col("sec")).as("ts"), col("value"))

  test("counterDeltas: growth differences, reset restarts from the new value, first sample null") {
    val got = RateOps
      .counterDeltas(counters, Seq("series"), "ts", "value", "event_id")
      .select("event_id", "delta")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(
      got == Map(
        1L -> None,
        2L -> Some(10.0),
        3L -> Some(15.0),
        4L -> Some(4.0),
        5L -> Some(5.0),
        6L -> None
      )
    )
  }

  test("increase: deltas land in the later sample's bucket; delta-free buckets report 0") {
    val got = RateOps
      .increase(counters, Seq("series"), "ts", "value", "1m", "event_id")
      .select("series", "bucket_ts", "increase", "rate_per_sec", "n_deltas")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000) -> ((r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap
    assert(got(("a", 0L)) == ((10.0, 10.0 / 60, 1L)))    // sample 1 (null) + sample 2 (10)
    assert(got(("a", 60L)) == ((19.0, 19.0 / 60, 2L)))   // 15 (growth) + 4 (reset)
    assert(got(("a", 120L)) == ((5.0, 5.0 / 60, 1L)))
    assert(got(("b", 0L)) == ((0.0, 0.0, 0L)))           // only the null first delta
  }

  test("timeWeightedAvg: LOCF to next sample, last sample holds to bucket end") {
    // one 60 s bucket: v=2 for 30 s (0..30), v=6 for 30 s (30..60)
    val g = Seq((1L, "a", 0L, 2.0), (2L, "a", 30L, 6.0))
      .toDF("event_id", "series", "sec", "value")
      .select(col("event_id"), col("series"), timestamp_seconds(col("sec")).as("ts"), col("value"))
    val rows = RateOps
      .timeWeightedAvg(g, Seq("series"), "ts", "value", "1m", "event_id")
      .select("twa", "covered_us")
      .collect()
    assert(rows.length == 1)
    assert(rows(0).getDouble(0) == 4.0)
    assert(rows(0).getLong(1) == 60L * 1000000)
  }

  test("timeWeightedAvg: coverage starts at the bucket's first sample; plain avg would differ") {
    // samples at 45 s (v=1, holds 10 s) and 55 s (v=11, holds 5 s):
    // twa = (1*10 + 11*5) / 15 ; plain avg = 6
    val g = Seq((1L, "a", 45L, 1.0), (2L, "a", 55L, 11.0))
      .toDF("event_id", "series", "sec", "value")
      .select(col("event_id"), col("series"), timestamp_seconds(col("sec")).as("ts"), col("value"))
    val r = RateOps
      .timeWeightedAvg(g, Seq("series"), "ts", "value", "1m", "event_id")
      .select("twa", "covered_us")
      .collect()(0)
    assert(math.abs(r.getDouble(0) - 65.0 / 15) < 1e-12)
    assert(r.getLong(1) == 15L * 1000000)
  }

  test("timeWeightedAvg: equal timestamps get zero weight for the tie-break-earlier duplicate") {
    val g = Seq((1L, "a", 10L, 100.0), (2L, "a", 10L, 3.0))
      .toDF("event_id", "series", "sec", "value")
      .select(col("event_id"), col("series"), timestamp_seconds(col("sec")).as("ts"), col("value"))
    val r = RateOps
      .timeWeightedAvg(g, Seq("series"), "ts", "value", "1m", "event_id")
      .select("twa")
      .collect()(0)
    // event 1 weights 0 us, event 2 holds 10..60 s
    assert(r.getDouble(0) == 3.0)
  }

  test("plan: one exchange each — the bucket reduce reuses the window's key clustering") {
    val inc = RateOps
      .increase(counters, Seq("series"), "ts", "value", "1m", "event_id")
      .queryExecution
      .executedPlan
      .toString
    assert("Exchange hashpartitioning".r.findAllIn(inc).size == 1, inc)
    val twa = RateOps
      .timeWeightedAvg(counters, Seq("series"), "ts", "value", "1m", "event_id")
      .queryExecution
      .executedPlan
      .toString
    assert("Exchange hashpartitioning".r.findAllIn(twa).size == 1, twa)
  }
}
