package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  test("change log becomes half-open validity intervals; last row open/current") {
    val df = Seq(
      (1L, "u1", 100L, "bronze"),
      (2L, "u1", 200L, "silver"),
      (3L, "u1", 300L, "gold"),
      (4L, "u2", 150L, "bronze")
    ).toDF("event_id", "user_id", "sec", "tier")
      .select(col("event_id"), col("user_id"), timestamp_seconds(col("sec")).as("ts"), col("tier"))

    val got = Scd2
      .history(df, Seq("user_id"), "ts", "event_id")
      .select("event_id", "effective_from_s", "effective_to_s", "is_current")
      .collect()
      .map { r =>
        val to = if (r.isNullAt(2)) None else Some(r.getLong(2))
        r.getLong(0) -> ((r.getLong(1), to, r.getBoolean(3)))
      }
      .toMap

    assert(got(1L) == ((100L, Some(200L), false)))
    assert(got(2L) == ((200L, Some(300L), false)))
    assert(got(3L) == ((300L, None, true)))
    assert(got(4L) == ((150L, None, true)))
  }

  test("same-ts changes order by the tie-break column") {
    val df = Seq((1L, "u", 100L), (2L, "u", 100L))
      .toDF("event_id", "user_id", "sec")
      .select(col("event_id"), col("user_id"), timestamp_seconds(col("sec")).as("ts"))
    val got = Scd2
      .history(df, Seq("user_id"), "ts", "event_id")
      .select("event_id", "is_current")
      .collect()
      .map(r => r.getLong(0) -> r.getBoolean(1))
      .toMap
    assert(got == Map(1L -> false, 2L -> true))
  }
}
