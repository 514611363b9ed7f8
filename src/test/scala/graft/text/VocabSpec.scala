package graft.text

import graft.SparkSpec

class VocabSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat"),
    (2L, "the dog sat"),
    (3L, "a rare xylophone")
  ).toDF("doc_id", "text")

  test("topTokens: count-desc, boundary ties lexicographic") {
    val top = Vocab.topTokens(docs, "text", 3).as[(String, Long)].collect().toSeq
    // counts: the=2, sat=2, a/cat/dog/rare/xylophone=1 -> third slot is 'a' by tie
    assert(top == Seq(("sat", 2L), ("the", 2L), ("a", 1L)) || top == Seq(("the", 2L), ("sat", 2L), ("a", 1L)))
    assert(top.map(_._1).toSet == Set("the", "sat", "a"))
  }

  test("oovRate: exact per-document OOV counts against the top-n vocab") {
    val got = Vocab
      .oovRate(docs, "doc_id", "text", vocabSize = 3)
      .as[(Long, Long, Long, Double)]
      .collect()
      .map(r => r._1 -> r)
      .toMap
    // vocab = {the, sat, a}
    assert(got(1L) == ((1L, 3L, 1L, 1.0 / 3))) // cat OOV
    assert(got(2L) == ((2L, 3L, 1L, 1.0 / 3))) // dog OOV
    assert(got(3L) == ((3L, 3L, 2L, 2.0 / 3))) // rare, xylophone OOV
  }

  test("full vocab drives OOV to zero") {
    val got = Vocab.oovRate(docs, "doc_id", "text", vocabSize = 100)
    assert(got.select("n_oov").as[Long].collect().forall(_ == 0L))
  }
}
