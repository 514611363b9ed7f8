package graft.text

import graft.SparkSpec

class VocabGrowthSpec extends SparkSpec {
  import spark.implicits._

  test("new types attributed to the min doc id; running vocab and token counts exact") {
    val df = Seq(
      (0L, "a b a"),    // bucket 0: types a,b new; 3 tokens
      (1L, "b c"),      // bucket 0: c new; 2 tokens
      (10L, "a c d"),   // bucket 1: d new; 3 tokens
      (11L, "d d")      // bucket 1: 2 tokens
    ).toDF("doc_id", "text")

    val got = CorpusStats
      .vocabGrowth(df, "doc_id", "text", bucketWidth = 10L)
      .select("bucket", "n_tokens", "new_types", "vocab_size", "cum_tokens")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)

    assert(got.toSeq == Seq((0L, 5L, 3L, 3L, 5L), (1L, 5L, 1L, 4L, 10L)))
  }

  test("a bucket introducing nothing still appears with zero new types") {
    val df = Seq((0L, "x y"), (10L, "x y x")).toDF("doc_id", "text")
    val got = CorpusStats
      .vocabGrowth(df, "doc_id", "text", bucketWidth = 10L)
      .select("bucket", "new_types", "vocab_size")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((0L, 2L, 2L), (1L, 0L, 2L)))
  }
}
