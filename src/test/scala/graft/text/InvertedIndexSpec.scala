package graft.text

import graft.SparkSpec
import graft.core.DeltaCodec

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (3L, "apple banana"),
    (7L, "banana cherry banana"), // repeated token: one posting
    (12L, "apple banana cherry"),
    (20L, "durian")
  ).toDF("doc_id", "text")

  test("posting lists: df, first id, ascending gaps") {
    val got = InvertedIndex
      .postings(docs, "doc_id", "text")
      .select("token", "df", "first_id", "gaps_csv")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(
      got == Set(
        ("apple", 2L, 3L, "9"),
        ("banana", 3L, 3L, "4,5"),
        ("cherry", 2L, 7L, "5"),
        ("durian", 1L, 20L, "")
      )
    )
  }

  test("binary postings round-trip through DeltaCodec to the exact id list") {
    val rows = InvertedIndex
      .postings(docs, "doc_id", "text")
      .select("token", "postings_bin")
      .collect()
      .map(r => r.getString(0) -> DeltaCodec.decode(r.getAs[Array[Byte]](1)).toSeq)
      .toMap
    assert(rows("banana") == Seq(3L, 7L, 12L))
    assert(rows("apple") == Seq(3L, 12L))
    assert(rows("durian") == Seq(20L))
  }

  test("minDf and maxDf bound the vocabulary") {
    val kept = InvertedIndex
      .postings(docs, "doc_id", "text", minDf = 2, maxDf = 2)
      .select("token")
      .collect()
      .map(_.getString(0))
      .toSet
    assert(kept == Set("apple", "cherry")) // banana df=3 capped, durian df=1 floored
  }
}
