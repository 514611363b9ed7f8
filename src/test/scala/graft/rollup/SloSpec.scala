package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SloSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L

  // day 0: hour 0 has 2/4 errors (short burn 2.0 at budget 0.25), the
  // day overall 3/12 (long burn 1.0); hour 1 has 1/4, hour 2 0/4.
  // day 1: hour 24 has 3/4 errors AND the day is 3/4 -> both fire.
  private def events = (
    Seq((0L, true), (1L, true), (2L, false), (3L, false)).map { case (i, e) => (i, 0L * H + i, e) } ++
      Seq((4L, true), (5L, false), (6L, false), (7L, false)).map { case (i, e) => (i, 1L * H + i, e) } ++
      Seq((8L, false), (9L, false), (10L, false), (11L, false)).map { case (i, e) => (i, 2L * H + i, e) } ++
      Seq((12L, true), (13L, true), (14L, true), (15L, false)).map { case (i, e) => (i, 24L * H + i, e) }
  ).toDF("event_id", "sec", "is_err")
    .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"), col("is_err"))

  test("burn rates are exact ratios and the alert needs BOTH windows hot") {
    val got = Slo
      .burnRate(events, "ts", "is_err", budgetRate = 0.25, shortThreshold = 1.5, longThreshold = 1.2)
      .collect()
      .map(r => r.getTimestamp(0).getTime / 1000 / H ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))))
      .toMap
    // hour 0: short burn (2/4)/0.25 = 2.0 but day burn (3/12)/0.25 = 1.0 -> no alert
    assert(got(0L) == ((2L, 4L, 2.0, 1.0, false)))
    assert(got(1L) == ((1L, 4L, 1.0, 1.0, false)))
    assert(got(2L) == ((0L, 4L, 0.0, 1.0, false)))
    // hour 24: short 3.0, day 3.0 -> alert
    assert(got(24L) == ((3L, 4L, 3.0, 3.0, true)))
  }
}
