package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DisorderSpec extends SparkSpec {
  import spark.implicits._

  test("lateness measured against the arrival-order high-water mark") {
    val df = Seq(
      // key u, arrival order 1..4: event times 10, 5, 20, 15
      //   ev2 is 5s behind hwm 10; ev4 is 5s behind hwm 20
      (1L, "u", 10L),
      (2L, "u", 5L),
      (3L, "u", 20L),
      (4L, "u", 15L),
      // key v: perfectly ordered
      (5L, "v", 1L),
      (6L, "v", 2L)
    ).toDF("event_id", "user", "sec")
      .select(col("event_id"), col("user"), timestamp_seconds(col("sec")).as("ts"))

    val got = Disorder
      .audit(df, Seq("user"), "ts", "event_id")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap

    assert(got("u") == ((4L, 2L, 5L, 0.5)))
    assert(got("v") == ((2L, 0L, 0L, 0.0)))
  }

  test("equal timestamps are in order (watermark is >=, not >)") {
    val df = Seq((1L, "u", 7L), (2L, "u", 7L))
      .toDF("event_id", "user", "sec")
      .select(col("event_id"), col("user"), timestamp_seconds(col("sec")).as("ts"))
    val r = Disorder.audit(df, Seq("user"), "ts", "event_id").collect().head
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L)
  }
}
