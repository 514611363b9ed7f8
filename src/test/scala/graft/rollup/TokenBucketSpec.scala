package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TokenBucketSpec extends SparkSpec {
  import spark.implicits._

  test("burst consumes the cap, refill re-admits; closed form matches the recursion") {
    // rate 1 token/s, cap 2 tokens, cost 1 token
    // events at t = 0, 0, 0, 1, 10:
    //   deficits 1, 2, 3 (deny), 3 (deny), 1 (allow)
    val df = Seq(
      (1L, "u", 0L),
      (2L, "u", 0L),
      (3L, "u", 0L),
      (4L, "u", 1L),
      (5L, "u", 10L),
      (6L, "v", 0L) // other key: independent bucket
    ).toDF("event_id", "user", "sec")
      .select(col("event_id"), col("user"), timestamp_seconds(col("sec")).as("ts"))

    val got = TokenBucket
      .audit(df, "user", "ts", "event_id", ratePerSecMicro = 1000000L, capMicro = 2000000L)
      .select("order_id", "deficit_micro", "allowed")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap

    assert(got(1L) == ((1000000L, true)))
    assert(got(2L) == ((2000000L, true)))
    assert(got(3L) == ((3000000L, false)))
    assert(got(4L) == ((3000000L, false)))
    assert(got(5L) == ((1000000L, true)))
    assert(got(6L) == ((1000000L, true)))
  }

  test("deficit never decays below one cost (bucket never over-fills)") {
    val df = Seq((1L, "u", 0L), (2L, "u", 1000000L))
      .toDF("event_id", "user", "sec")
      .select(col("event_id"), col("user"), timestamp_seconds(col("sec")).as("ts"))
    val got = TokenBucket
      .audit(df, "user", "ts", "event_id", 1000000L, 2000000L)
      .select("deficit_micro")
      .collect()
      .map(_.getLong(0))
    assert(got.toSeq == Seq(1000000L, 1000000L)) // huge idle gap still leaves cost
  }

  test("bad parameters rejected") {
    val df = Seq((1L, "u", 0L)).toDF("event_id", "user", "sec")
      .select(col("event_id"), col("user"), timestamp_seconds(col("sec")).as("ts"))
    intercept[IllegalArgumentException] {
      TokenBucket.audit(df, "user", "ts", "event_id", 0L, 2000000L)
    }
    intercept[IllegalArgumentException] {
      TokenBucket.audit(df, "user", "ts", "event_id", 1L, 1L, costMicro = 1000000L)
    }
  }
}
