package graft.rollup

import graft.SparkSpec

class IntegritySpec extends SparkSpec {
  import spark.implicits._

  test("detects duplicate ids and gap runs with exact coordinates") {
    // ids: 1,2,2,3,7,8,8,8,12 -> dup at 2 (x2) and 8 (x3); gaps 4-6 (3), 9-11 (3)
    val df = Seq(1L, 2L, 2L, 3L, 7L, 8L, 8L, 8L, 12L).toDF("event_id")
    val got = Integrity
      .sequenceAnomalies(df, "event_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(
      got == Set(
        ("dup", 2L, 2L),
        ("dup", 8L, 3L),
        ("gap", 4L, 3L),
        ("gap", 9L, 3L)
      )
    )
  }

  test("a clean contiguous stream reports nothing") {
    val df = (1L to 100L).toDF("event_id")
    assert(Integrity.sequenceAnomalies(df, "event_id").collect().isEmpty)
  }
}
