package graft.text

import graft.SparkSpec

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("frequency spectrum counts types per band with head-down token cumsum") {
    // corpus: the=3, cat=2, dog=2, sat=1, mat=1, hat=1
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the cat mat"),
      (3L, "the dog dog hat")
    ).toDF("doc_id", "text")

    val got = CorpusStats
      .frequencySpectrum(docs, "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    assert(
      got == Set(
        (3L, 1L, 3L, 3L),  // the
        (2L, 2L, 4L, 7L),  // cat + dog
        (1L, 3L, 3L, 10L)  // sat mat hat; cum = total tokens
      )
    )
  }
}
