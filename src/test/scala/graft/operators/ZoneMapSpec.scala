package graft.operators

import graft.SparkSpec

class ZoneMapSpec extends SparkSpec {
  import spark.implicits._

  test("per-zone stats reconcile with the input; zone ids bounded by the prefix") {
    val df = (0L until 300L).map(i => (i, s"t${i % 7}", i * 2)).toDF("user_id", "event_type", "event_id")
    val got = ZoneMap
      .stats(df, "user_id", "event_type", Seq("user_id", "event_id"), prefixBits = 4)
      .collect()
    // 8-bit zone ids
    assert(got.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 256))
    assert(got.map(_.getLong(1)).sum == 300L)
    // envelopes are consistent
    assert(got.forall(r => r.getLong(2) <= r.getLong(3) && r.getLong(4) <= r.getLong(5)))
  }

  test("zone assignment is deterministic") {
    val df = (0L until 50L).map(i => (i, "x", i)).toDF("user_id", "event_type", "event_id")
    val a = ZoneMap.stats(df, "user_id", "event_type", Seq("user_id"), prefixBits = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = ZoneMap.stats(df, "user_id", "event_type", Seq("user_id"), prefixBits = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("bad parameters rejected") {
    val df = Seq((1L, "x", 1L)).toDF("user_id", "event_type", "event_id")
    intercept[IllegalArgumentException] {
      ZoneMap.stats(df, "user_id", "event_type", Seq("user_id"), prefixBits = 0)
    }
    intercept[IllegalArgumentException] {
      ZoneMap.stats(df, "user_id", "event_type", Seq.empty)
    }
  }
}
