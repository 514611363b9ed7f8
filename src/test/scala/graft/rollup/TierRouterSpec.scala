package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TierRouterSpec extends SparkSpec {
  import spark.implicits._

  test("choose picks the coarsest dividing tier, never a non-divisor") {
    assert(TierRouter.choose(60L) == "1m")
    assert(TierRouter.choose(3600L) == "1h")
    assert(TierRouter.choose(7200L) == "1h") // 1d does not divide 2h
    assert(TierRouter.choose(86400L) == "1d")
    assert(TierRouter.choose(7L * 86400) == "1d") // a week: 30d does not divide
    assert(TierRouter.choose(60L * 86400) == "30d")
    // 90 minutes: 1h does not divide, 1m does
    assert(TierRouter.choose(5400L) == "1m")
    // 45 seconds: nothing stored divides — loud error, never a raw scan
    val e = intercept[IllegalArgumentException](TierRouter.choose(45L))
    assert(e.getMessage.contains("no stored tier"))
  }

  test("serve == bucketing raw data at the step directly") {
    val raw = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_type"), col("ts"), col("value").cast("long").as("v"))
    def tierOf(t: String) = Rollup.fromRaw(raw, Seq("event_type"), "ts", t, col("v"))
    val from = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val to = java.sql.Timestamp.valueOf("2024-01-06 00:00:00")
    val (tier, served) = TierRouter.serve(tierOf, Seq("event_type"), 7200L, from, to)
    assert(tier == "1h")
    val direct = raw
      .filter(col("ts") >= lit(from) && col("ts") < lit(to))
      .groupBy(
        col("event_type"),
        TierRouter.stepBucket(col("ts"), 7200L).as("bucket_ts"))
      .agg(count(lit(1)).as("point_count"), sum("v").as("byte_size"))
    assert(served.orderBy("event_type", "bucket_ts").collect().toSeq ==
      direct.orderBy("event_type", "bucket_ts").collect().toSeq)
  }
}
