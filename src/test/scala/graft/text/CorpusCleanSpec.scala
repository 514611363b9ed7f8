package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusCleanSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats: hand-computed fractions, clamp, and keep flag") {
    val docs = Seq(
      (1L, "a b c d e f g h"), // all distinct: dup 0, top-bigram 2/8
      (2L, "x y x y x y x y"), // bigram 'x y' run: clamped coverage
      (3L, "a a a a"), // overlapping run clamps to 1.0
      (4L, "q") // single token: no bigrams/trigrams
    ).toDF("doc_id", "text")
    val got = CorpusClean
      .repetitionStats(docs, "text")
      .select("doc_id", "dup_word_frac", "top_bigram_frac", "dup_trigram_frac", "keep")
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    // short docs concentrate bigram coverage: 2*1/8 = 0.25 > 0.125,
    // so even the all-distinct doc is (correctly) below the keep bar —
    // the thresholds are tuned for the ~50-token corpus docs
    assert(got(1L) == ((0.0, 0.25, 0.0, false)))
    // 'x y x y x y x y': 7 bigrams, 'x y' x4 -> min(1, 8/8) = 1.0;
    // trigrams 6 occurrences, 2 distinct -> 1 - 2/6
    assert(got(2L) == ((0.75, 1.0, 0.666667, false)))
    // 'a a a a': trigrams 2 occurrences, 1 distinct -> 0.5
    assert(got(3L) == ((0.75, 1.0, 0.5, false)))
    assert(got(4L) == ((0.0, 0.0, 0.0, true)))
  }

  test("repetitionStats is shuffle-free (pure map stage)") {
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val plan = CorpusClean.repetitionStats(docs, "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("dfPrune removes ubiquitous tokens, keeps order, preserves empty docs") {
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the dog ran"),
      (3L, "the the the"), // fully pruned -> empty clean_text
      (4L, "the bird flew")
    ).toDF("doc_id", "text")
    val (out, hot) = CorpusClean.dfPrune(docs, "doc_id", "text", minDfFrac = 0.9)
    assert(hot == Seq("the"))
    val rows = out.collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(rows(1L) == (("cat sat", 1L)))
    assert(rows(3L) == (("", 3L))) // doc survives with empty text, not dropped
    assert(rows.size == 4)
  }

  test("dfPrune fails loudly when the hot list would be data-sized") {
    val docs = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      CorpusClean.dfPrune(docs, "doc_id", "text", minDfFrac = 0.5, maxPruneVocab = 1)
    }
    assert(e.getMessage.contains("maxPruneVocab"))
  }

  test("redactPii: email then IP then phone, counts match, clean text untouched") {
    val df = Seq(
      (1L, "write user_1@mail0.com or admin@x.co from 10.2.0.1 call 555-0142 and 555-0011"),
      (2L, "no pii here at all")
    ).toDF("doc_id", "text")
    val got = df
      .select(
        col("doc_id"),
        CorpusClean.redactPii(col("text")).as("red"),
        CorpusClean.piiCount(col("text"), CorpusClean.EmailRe).as("ne"),
        CorpusClean.piiCount(col("text"), CorpusClean.IpRe).as("ni"),
        CorpusClean.piiCount(col("text"), CorpusClean.PhoneRe).as("np")
      )
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(
      got(1L) == (("write <EMAIL> or <EMAIL> from <IP> call <PHONE> and <PHONE>", 2L, 1L, 2L))
    )
    assert(got(2L) == (("no pii here at all", 0L, 0L, 0L)))
  }

  test("redactPii: the IP rule never fires inside a redacted email host") {
    val df = Seq((1L, "mail me at a1@10.0.0.2.net thanks")).toDF("doc_id", "text")
    val red = df.select(CorpusClean.redactPii(col("text"))).as[String].head()
    assert(red == "mail me at <EMAIL> thanks")
  }
}
