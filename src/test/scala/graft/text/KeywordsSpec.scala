package graft.text

import graft.SparkSpec

class KeywordsSpec extends SparkSpec {
  import spark.implicits._

  test("top-k by integer tf-idf surrogate, score/token tie-break, short tokens dropped") {
    val docs = Seq(
      (1L, "zebra zebra common common common ab"),
      (2L, "common yonder"),
      (3L, "common")
    ).toDF("doc_id", "text")

    val got = Keywords
      .topKeywords(docs, "doc_id", "text", k = 2, minTokenLen = 4)
      .select("id", "token", "tf", "df", "score", "rank")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))
      .toSet

    // doc1: zebra tf=2 df=1 -> 2_000_000; common tf=3 df=3 -> 1_000_000; "ab" dropped (len<4)
    // doc2: yonder tf=1 df=1 -> 1_000_000; common tf=1 df=3 -> 333_333
    // doc3: common only
    assert(
      got == Set(
        (1L, "zebra", 2L, 1L, 2000000L, 1),
        (1L, "common", 3L, 3L, 1000000L, 2),
        (2L, "yonder", 1L, 1L, 1000000L, 1),
        (2L, "common", 1L, 3L, 333333L, 2),
        (3L, "common", 1L, 3L, 333333L, 1)
      )
    )
  }

  test("token ascending breaks exact score ties deterministically") {
    val docs = Seq((1L, "bbbb aaaa")).toDF("doc_id", "text")
    val got = Keywords
      .topKeywords(docs, "doc_id", "text", k = 1)
      .select("token")
      .collect()
      .map(_.getString(0))
    assert(got.toSeq == Seq("aaaa"))
  }
}
