package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LttbSpec extends SparkSpec {
  import spark.implicits._

  // three 1m buckets: a flat wiggle, a spike, a lone tail point
  private def pts = Seq(
    (1L, "a", 0L, 0.0),
    (2L, "a", 10L, 10.0),
    (3L, "a", 20L, 0.0),
    (4L, "a", 70L, 5.0),
    (5L, "a", 80L, 100.0),
    (6L, "a", 90L, 1.0),
    (7L, "a", 130L, 3.0)
  ).toDF("event_id", "series", "sec", "value")
    .select(col("event_id"), col("series"), timestamp_seconds(col("sec")).as("ts"), col("value"))

  test("lttb: picks the largest-triangle point per bucket against boundary anchors") {
    val got = Downsample
      .lttb(pts, Seq("series"), "ts", "value", "1m", "event_id")
      .collect()
      .map(r => r.getTimestamp(1).getTime / 1000 -> r)
      .toMap
    // bucket 0: A = own first (0s,0), C = next first (70s,5) -> argmax |x*5e6 - 70*y| = P2
    assert(got(0L).getAs[Long]("event_id") == 2L)
    assert(got(0L).getAs[Long]("area2") == 650000000L) // |10*5e6 - 70*10e6|
    assert(got(0L).getAs[Long]("n_points") == 3L)
    // bucket 1: A = prev last (20s,0), C = next first (130s,3) -> the 100.0 spike survives
    assert(got(60L).getAs[Long]("event_id") == 5L)
    assert(got(60L).getAs[Double]("sel_v") == 100.0)
    // bucket 2: single point anchors on itself, zero area
    assert(got(120L).getAs[Long]("event_id") == 7L && got(120L).getAs[Long]("area2") == 0L)
  }

  test("lttb: exact area ties resolve toward the earliest (second, tieBreak)") {
    // one bucket; A = first (0s,0), C = last (30s,0): area2 = 30 * |y| micros
    val tie = Seq((1L, "b", 0L, 0.0), (2L, "b", 10L, 5.0), (3L, "b", 20L, -5.0), (4L, "b", 30L, 0.0))
      .toDF("event_id", "series", "sec", "value")
      .select(col("event_id"), col("series"), timestamp_seconds(col("sec")).as("ts"), col("value"))
    val r = Downsample.lttb(tie, Seq("series"), "ts", "value", "1m", "event_id").collect()(0)
    assert(r.getAs[Long]("event_id") == 2L, r)
    assert(r.getAs[Long]("area2") == 150000000L)
  }

  test("plan: corpus shuffles only on the bucket key; anchors join is broadcast") {
    val plan = Downsample
      .lttb(pts, Seq("series"), "ts", "value", "1m", "event_id")
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // corpus-side exchanges: anchor aggregation + final aggregation
    // (plus one window exchange over the bucket-count-sized relation)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 3, plan)
  }
}
