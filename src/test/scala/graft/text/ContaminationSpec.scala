package graft.text

import graft.SparkSpec

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  test("containment counts shared 3-grams and thresholds exactly") {
    val train = Seq(
      (1L, "a b c d e"), // shingles: abc bcd cde
      (2L, "x y z w")
    ).toDF("id", "text")
    val eval = Seq(
      (10L, "a b c d q"), // abc bcd in train, cdq not -> 2/3 hit
      (11L, "p q r s"),   // none hit -> 0/2
      (12L, "a b c")      // abc -> 1/1, contaminated
    ).toDF("id", "text")

    val got = Contamination
      .ngramContainment(train, eval, "id", "text", n = 3, thresholdPct = 50)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet

    assert(
      got == Set(
        (10L, 3L, 2L, true), // 2*100 >= 3*50
        (11L, 2L, 0L, false),
        (12L, 1L, 1L, true)
      )
    )
  }

  test("eval docs shorter than n tokens are omitted, duplicate shingles counted once") {
    val train = Seq((1L, "a b c a b c")).toDF("id", "text")
    val eval = Seq((10L, "a b"), (11L, "a b c a b c a b c")).toDF("id", "text")
    val got = Contamination
      .ngramContainment(train, eval, "id", "text", n = 3, thresholdPct = 100)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    // doc 11 has distinct shingles {abc, bca, cab} (repeats collapse);
    // train has the same distinct set -> full containment
    assert(got == Set((11L, 3L, 3L, true)))
  }
}
