package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SeriesMathSpec extends SparkSpec {
  import spark.implicits._

  test("full-outer alignment: zero fill, null ratio on empty denominator") {
    val df = Seq(
      // hour 0: 2 errors, 4 clicks -> 0.5
      ("error", 100L), ("error", 200L),
      ("click", 10L), ("click", 20L), ("click", 30L), ("click", 40L),
      // hour 1: errors only -> ratio null (denominator empty)
      ("error", 3700L),
      // hour 2: clicks only -> 0/3 = 0.0
      ("click", 7300L), ("click", 7400L), ("click", 7500L),
      // other series never contribute
      ("view", 100L)
    ).toDF("event_type", "sec")
      .select(col("event_type"), timestamp_seconds(col("sec")).as("ts"))

    val got = SeriesMath
      .alignRatio(df, "event_type", "ts", "1h", "error", "click")
      .collect()
      .map { r =>
        val ratio = if (r.isNullAt(3)) None else Some(r.getDouble(3))
        r.getTimestamp(0).getTime / 3600000L -> ((r.getLong(1), r.getLong(2), ratio))
      }
      .toMap

    assert(got(0L) == ((2L, 4L, Some(0.5))))
    assert(got(1L) == ((1L, 0L, None)))
    assert(got(2L) == ((0L, 3L, Some(0.0))))
    assert(got.size == 3)
  }

  test("month bucket target works through the tier API") {
    val df = Seq(
      ("a", "2024-01-05 10:00:00"), ("a", "2024-01-25 10:00:00"),
      ("a", "2024-02-01 00:00:00")
    ).toDF("series", "s")
      .select(col("series"), col("s").cast("timestamp").as("ts"))
    val t1d = Rollup.fromRaw(df, Seq("series"), "ts", "1d", lit(0L))
    val m = Rollup
      .reRollup(t1d, Seq("series"), "1d" -> "month")
      .select(col("bucket_ts").cast("string"), col("point_count"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(m == Map("2024-01-01 00:00:00" -> 2L, "2024-02-01 00:00:00" -> 1L))
  }
}
