package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OverlapSpec extends SparkSpec {
  import spark.implicits._

  // one day: segment x = {1,2,3}, y = {2,3,4}, z = {5}; user 2 hits x twice
  private def events = Seq(
    ("x", 1L, 0L), ("x", 2L, 10L), ("x", 2L, 20L), ("x", 3L, 30L),
    ("y", 2L, 40L), ("y", 3L, 50L), ("y", 4L, 60L),
    ("z", 5L, 70L)
  ).toDF("seg", "member", "sec")
    .select(col("seg"), col("member"), timestamp_seconds(col("sec")).as("ts"))

  test("pairwise: exact distinct intersections and Jaccard") {
    val got = Overlap
      .pairwise(events, "seg", "member", "ts", "day")
      .collect()
      .map(r => (r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))))
      .toMap
    // x∩y = {2,3}; duplicates inside x must not inflate counts
    assert(got(("x", "y")) == ((3L, 3L, 2L, 0.5)))
    // disjoint pairs never appear (inner join on shared members)
    assert(!got.contains(("x", "z")) && !got.contains(("y", "z")))
  }

  test("sketch path equals the exact path in exact mode") {
    val exact = Overlap
      .pairwise(events, "seg", "member", "ts", "day")
      .orderBy("bucket_ts", "seg_a", "seg_b")
      .collect()
      .toSeq
    val sketch = Overlap
      .pairwiseSketch(events, "seg", "member", "ts", "day")
      .orderBy("bucket_ts", "seg_a", "seg_b")
      .collect()
      .toSeq
    assert(sketch == exact)
  }

  test("buckets separate: the same pair recounts per day") {
    val twoDays = events.union(
      Seq(("x", 9L, 86400L), ("y", 9L, 86500L))
        .toDF("seg", "member", "sec")
        .select(col("seg"), col("member"), timestamp_seconds(col("sec")).as("ts")))
    val got = Overlap
      .pairwise(twoDays, "seg", "member", "ts", "day")
      .filter(col("seg_a") === "x" && col("seg_b") === "y")
      .collect()
      .map(r => r.getTimestamp(0).getTime / 86400000 -> r.getLong(5))
      .toMap
    assert(got == Map(0L -> 2L, 1L -> 1L))
  }
}
