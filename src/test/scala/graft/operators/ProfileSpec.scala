package graft.operators

import graft.SparkSpec

/** One-pass column profiling goldens. */
class ProfileSpec extends SparkSpec {

  import spark.implicits._

  test("per-column counts, nulls, distincts, lexicographic extrema") {
    val df = Seq(
      (Some(1), Some("b")),
      (Some(2), Some("a")),
      (Some(2), None),
      (None, Some("a"))
    ).toDF("k", "s")
    val got = Profile.profile(df, Seq("k", "s"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect()
      .toSeq
    assert(got == Seq(
      ("k", 4L, 1L, 2L, Some("1"), Some("2")),
      ("s", 4L, 1L, 2L, Some("a"), Some("b"))))
  }

  test("an all-null column profiles with null extrema and zero distincts") {
    val df = Seq((1, Option.empty[String]), (2, None)).toDF("k", "s")
    val got = Profile.profile(df, Seq("s"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .head()
    assert(got == (("s", 2L, 2L, 0L, None, None)))
  }

  test("empty column list raises") {
    val df = Seq((1, "a")).toDF("k", "s")
    intercept[IllegalArgumentException](Profile.profile(df, Nil))
  }
}
