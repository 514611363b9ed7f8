package graft.rollup

import graft.SparkSpec

class EcdfSpec extends SparkSpec {
  import spark.implicits._

  test("ties share the max rank (P[X <= x]); rational is exact; groups independent") {
    val df = Seq(
      (1L, "a", 1.0),
      (2L, "a", 2.0),
      (3L, "a", 2.0),
      (4L, "a", 5.0),
      (5L, "b", 9.0)
    ).toDF("event_id", "grp", "value")

    val got = Ecdf
      .normalize(df, "grp", "value")
      .select("event_id", "ecdf_num", "ecdf_den", "ecdf")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

    assert(got(1L) == ((1L, 4L, 0.25)))
    assert(got(2L) == ((3L, 4L, 0.75))) // tie run 2.0,2.0 -> both rank 3 of 4
    assert(got(3L) == ((3L, 4L, 0.75)))
    assert(got(4L) == ((4L, 4L, 1.0))) // max value always maps to exactly 1.0
    assert(got(5L) == ((1L, 1L, 1.0))) // singleton group
  }
}
