package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusPackSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    // en: quality order 3 (q .9, 50 tok), 1 (q .8, 40), 2 (q .5, 30)
    (1L, "en", 40L, 0.8),
    (2L, "en", 30L, 0.5),
    (3L, "en", 50L, 0.9),
    // de: single doc over its budget
    (4L, "de", 100L, 0.9),
    // fr: default budget applies
    (5L, "fr", 10L, 0.2)
  ).toDF("doc_id", "lang", "tokens", "quality")

  test("budget prefix in quality order; overflow doc and everything after it drop") {
    // en budget 95: doc3 (cum 50) + doc1 (cum 90) fit; doc2 (cum 120) drops
    val got = CorpusPack
      .packByBudget(docs, "lang", "tokens", "quality", "doc_id", Map("en" -> 95L, "de" -> 50L), 100L)
      .select("doc_id", "cum_tokens")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == Map(3L -> 50L, 1L -> 90L, 5L -> 10L)) // de's only doc (100 > 50) drops
  }

  test("strict prefix: a small doc ranked below the overflowing doc is still dropped") {
    val d = Seq((1L, "en", 90L, 0.9), (2L, "en", 50L, 0.8), (3L, "en", 5L, 0.7))
      .toDF("doc_id", "lang", "tokens", "quality")
    val kept = CorpusPack
      .packByBudget(d, "lang", "tokens", "quality", "doc_id", Map.empty, 100L)
      .select("doc_id")
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(kept == Set(1L)) // doc2 overflows (140), doc3 (145) stays dropped
  }

  test("quality ties break on tieBreak, so the prefix is reproducible") {
    val d = Seq((2L, "en", 60L, 0.5), (1L, "en", 60L, 0.5)).toDF("doc_id", "lang", "tokens", "quality")
    val kept = CorpusPack
      .packByBudget(d, "lang", "tokens", "quality", "doc_id", Map.empty, 60L)
      .select("doc_id")
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(kept == Set(1L))
  }

  test("plan: one exchange — the filter rides the window's partitioning") {
    val plan = CorpusPack
      .packByBudget(docs, "lang", "tokens", "quality", "doc_id", Map("en" -> 95L), 100L)
      .queryExecution
      .executedPlan
      .toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }
}
