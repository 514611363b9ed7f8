package graft.dedup

import graft.SparkSpec

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  test("cross-doc repeated spans carry exact positions and group stats") {
    val docs = Seq(
      (1L, "x x a b c y y"),   // "a b c" at pos 2
      (2L, "a b c z z"),       // "a b c" at pos 0
      (3L, "q r s t u"),       // unique text
      (4L, "a b c z z")        // exact dup of doc 2: every span shared
    ).toDF("doc_id", "text")

    val got = SpanDedup
      .repeatedSpans(docs, "doc_id", "text", k = 3)
      .select("id", "pos", "n_docs", "n_occ")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    // "a b c": docs 1 (pos 2), 2 (pos 0), 4 (pos 0) -> n_docs 3, n_occ 3
    assert(got.contains((1L, 2L, 3L, 3L)))
    assert(got.contains((2L, 0L, 3L, 3L)))
    assert(got.contains((4L, 0L, 3L, 3L)))
    // "b c z" and "c z z": docs 2+4 only
    assert(got.contains((2L, 1L, 2L, 2L)) && got.contains((4L, 1L, 2L, 2L)))
    assert(got.contains((2L, 2L, 2L, 2L)) && got.contains((4L, 2L, 2L, 2L)))
    // doc 3 never appears; doc 1's other spans are unique
    assert(!got.exists(_._1 == 3L))
    assert(got.count(_._1 == 1L) == 1)
  }

  test("within-doc repetition alone does not cross the minDocs bar") {
    val docs = Seq((1L, "a b a b a b"), (2L, "c d e")).toDF("doc_id", "text")
    val got = SpanDedup.repeatedSpans(docs, "doc_id", "text", k = 2).collect()
    assert(got.isEmpty) // "a b" repeats but only inside doc 1
  }
}
