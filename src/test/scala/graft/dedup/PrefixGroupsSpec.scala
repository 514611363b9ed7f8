package graft.dedup

import graft.SparkSpec

class PrefixGroupsSpec extends SparkSpec {
  import spark.implicits._

  test("docs sharing a first-k prefix group; unique prefixes and short docs drop") {
    val df = Seq(
      (1L, "welcome to acme products list alpha"),
      (2L, "welcome to acme careers page"),
      (7L, "welcome to acme about"),
      (3L, "totally different text here"),
      (4L, "welcome to"), // shorter than k=3: filtered out
      (5L, "welcome to zeta shop")
    ).toDF("doc_id", "text")

    val got = SpanDedup
      .prefixGroups(df, "doc_id", "text", k = 3)
      .select("n_docs", "min_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    // exactly one group: the three "welcome to acme" docs, exemplar 1
    assert(got.toSeq == Seq((3L, 1L)))
  }
}
