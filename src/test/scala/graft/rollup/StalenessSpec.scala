package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StalenessSpec extends SparkSpec {
  import spark.implicits._

  test("stale series flagged against the corpus max-ts anchor, not wall clock") {
    val df = Seq(
      ("a", 0L),
      ("a", 100000L), // fresh: defines the anchor
      ("b", 10000L),  // 90000s old > 86400 -> stale
      ("c", 99999L)   // 1s old -> fresh
    ).toDF("series", "sec")
      .select(col("series"), timestamp_seconds(col("sec")).as("ts"))

    val got = Staleness
      .check(df, Seq("series"), "ts", staleAfterSec = 86400L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap

    assert(got("a") == ((100000L, 2L, 0L, false)))
    assert(got("b") == ((10000L, 1L, 90000L, true)))
    assert(got("c") == ((99999L, 1L, 1L, false)))
  }
}
