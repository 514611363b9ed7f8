package graft.rollup

import graft.SparkSpec

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  test("overlapping and touching intervals merge; gaps split islands") {
    val df = Seq(
      // island 1: [0,10) ∪ [5,12) ∪ [12,15) -> [0,15), 3 intervals
      ("a", 0L, 10L),
      ("a", 5L, 12L),
      ("a", 12L, 15L), // touches (end-exclusive): still one island (s == prev max e is NOT >)
      // island 2 after a gap
      ("a", 20L, 25L),
      // containment: [0,100) swallows [10,20)
      ("b", 0L, 100L),
      ("b", 10L, 20L)
    ).toDF("series", "s", "e")

    val got = Intervals
      .unionCoverage(df, "series", "s", "e")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

    assert(
      got == Set(
        ("a", 0L, 15L, 15L, 3L),
        ("a", 20L, 25L, 5L, 1L),
        ("b", 0L, 100L, 100L, 2L)
      )
    )
  }

  test("zero-length intervals drop; out-of-order input is handled by the sort") {
    val df = Seq(
      ("x", 50L, 60L),
      ("x", 10L, 10L), // zero-length: dropped
      ("x", 55L, 58L),
      ("x", 5L, 52L)   // arrives last, starts first: one island 5..60
    ).toDF("series", "s", "e")
    val got = Intervals
      .unionCoverage(df, "series", "s", "e")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((5L, 60L, 55L, 3L)))
  }
}
