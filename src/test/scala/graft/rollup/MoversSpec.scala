package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MoversSpec extends SparkSpec {
  import spark.implicits._

  test("delta across the data midpoint; ranking by abs delta with series tie-break") {
    // range [0, 100] -> mid = 50; ts <= 50 is "before"
    val df = (
      Seq.fill(5)(("up", 60L)) ++ Seq(("up", 0L)) ++        // 1 before, 5 after: delta +4
        Seq.fill(4)(("down", 10L)) ++ Seq(("down", 100L)) ++ // 4 before, 1 after: delta -3
        Seq(("flat", 0L), ("flat", 51L))                     // 1 / 1: delta 0
    ).zipWithIndex.map { case ((s, sec), i) => (i.toLong, s, sec) }
      .toDF("event_id", "series", "sec")
      .select(col("event_id"), col("series"), timestamp_seconds(col("sec")).as("ts"))

    val got = Movers
      .topMovers(df, Seq("series"), "ts", k = 2)
      .select("series", "n_before", "n_after", "delta", "abs_delta")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    assert(got.toSeq == Seq(("up", 1L, 5L, 4L, 4L), ("down", 4L, 1L, -3L, 3L)))
  }

  test("boundary point (ts == mid) counts as before") {
    val df = Seq((1L, "a", 0L), (2L, "a", 50L), (3L, "a", 100L))
      .toDF("event_id", "series", "sec")
      .select(col("event_id"), col("series"), timestamp_seconds(col("sec")).as("ts"))
    val r = Movers.topMovers(df, Seq("series"), "ts", 1).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 1L) // 0 and 50 before, 100 after
  }
}
