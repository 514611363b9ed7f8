package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CohortSpec extends SparkSpec {
  import spark.implicits._

  private val Day = 86400L

  // day0 cohort: u1, u2 (u1 returns day1+day2, u2 returns day2);
  // day1 cohort: u3 (never returns); repeat activity must not double-count
  private def events = Seq(
    (1L, 0L), (1L, 10L), (1L, Day), (1L, 2 * Day),
    (2L, 20L), (2L, 2 * Day + 5),
    (3L, Day + 30L)
  ).toDF("member", "sec")
    .select(col("member"), timestamp_seconds(col("sec")).as("ts"))

  test("retention matrix: cohort assignment, offsets, rates") {
    val got = Cohort
      .retention(events, "member", "ts")
      .collect()
      .map(r => (r.getTimestamp(0).getTime / 1000 / Day, r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got == Map(
      (0L, 0L) -> ((2L, 2L, 1.0)),
      (0L, 1L) -> ((1L, 2L, 0.5)),
      (0L, 2L) -> ((2L, 2L, 1.0)),
      (1L, 0L) -> ((1L, 1L, 1.0))
    ))
  }
}
