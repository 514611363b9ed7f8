package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DownsampleSpec extends SparkSpec {
  import spark.implicits._

  private def pts = Seq(
    // series a, one minute bucket: first(0s,5), min(20s,1), max(40s,9), last(50s,3)
    (1L, "a", 0L, 5.0),
    (2L, "a", 20L, 1.0),
    (3L, "a", 40L, 9.0),
    (4L, "a", 50L, 3.0),
    // series a, next bucket: single point is all four roles
    (5L, "a", 70L, 2.0)
  ).toDF("event_id", "series", "sec", "value")
    .select(col("event_id"), col("series"), timestamp_seconds(col("sec")).as("ts"), col("value"))

  test("m4: first/last by time, argmin/argmax by value, per bucket") {
    val got = Downsample
      .m4(pts, Seq("series"), "ts", "value", "1m", "event_id")
      .collect()
      .map(r => r.getTimestamp(1).getTime / 1000 -> r)
      .toMap
    val b0 = got(0L)
    assert(b0.getAs[java.sql.Timestamp]("first_ts").getTime == 0L && b0.getAs[Double]("first_v") == 5.0)
    assert(b0.getAs[java.sql.Timestamp]("min_ts").getTime == 20000L && b0.getAs[Double]("min_v") == 1.0)
    assert(b0.getAs[java.sql.Timestamp]("max_ts").getTime == 40000L && b0.getAs[Double]("max_v") == 9.0)
    assert(b0.getAs[java.sql.Timestamp]("last_ts").getTime == 50000L && b0.getAs[Double]("last_v") == 3.0)
    assert(b0.getAs[Long]("n_points") == 4L)
    val b1 = got(60L)
    assert(b1.getAs[Double]("first_v") == 2.0 && b1.getAs[Double]("min_v") == 2.0)
    assert(b1.getAs[Double]("max_v") == 2.0 && b1.getAs[Double]("last_v") == 2.0)
  }

  test("m4: value ties resolve earliest for min, latest for max — deterministically") {
    val tie = Seq((1L, "a", 5L, 7.0), (2L, "a", 15L, 7.0))
      .toDF("event_id", "series", "sec", "value")
      .select(col("event_id"), col("series"), timestamp_seconds(col("sec")).as("ts"), col("value"))
    val r = Downsample.m4(tie, Seq("series"), "ts", "value", "1m", "event_id").collect()(0)
    assert(r.getAs[java.sql.Timestamp]("min_ts").getTime == 5000L)
    assert(r.getAs[java.sql.Timestamp]("max_ts").getTime == 15000L)
  }

  test("plan: single hash aggregate with a partial (map-side) phase, one exchange") {
    val plan = Downsample
      .m4(pts, Seq("series"), "ts", "value", "1m", "event_id")
      .queryExecution
      .executedPlan
      .toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("partial_min") || plan.toLowerCase.contains("hashaggregate"), plan)
  }
}
