package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-cleaning operators for web-scale training-data pipelines:
  * repetition-based quality stats, corpus-level document-frequency
  * boilerplate pruning, and PII redaction.
  *
  * Scale design:
  *   - `repetitionStats` is entirely per-row (higher-order array
  *     functions over the token array — sort + one-pass run-length
  *     aggregate for the top n-gram). Zero shuffles: at 100 TB it is a
  *     pure map stage that rides whatever partitioning the scan has.
  *     The alternative (explode n-grams + groupBy doc) shuffles the
  *     full token stream; per-row HOFs avoid that entirely.
  *   - `dfPrune` shuffles only distinct (token) keys after a map-side
  *     `array_distinct` (so the shuffle is bounded by vocabulary ×
  *     docs-per-partition, not token occurrences), collects only the
  *     vocabulary-bounded hot-word list (guarded by `maxPruneVocab`,
  *     the same bounded-model-relation pattern as the FD lists), and
  *     applies it as a broadcast array literal per row — the CCNet
  *     common-line-removal shape adapted to word streams.
  *   - `redactPii` / `piiCount` are single regexp expressions
  *     (codegen'd), order: email → IP → phone so the IP rule can
  *     never fire inside an already-redacted email host.
  */
object CorpusClean {

  /** Gopher-style repetition thresholds adapted to this corpus's word
    * streams (no newlines): measured p50 dup-word ≈ 0.54 and p90
    * top-bigram ≈ 0.13, so the keep rule splits the corpus instead of
    * passing or rejecting everything.
    */
  val MaxDupWordFrac = 0.6
  val MaxTopBigramFrac = 0.125

  /** Longest run of equal adjacent elements in a sorted string array —
    * i.e. the max frequency of any element — in one aggregate pass,
    * no shuffle. Empty arrays yield 0.
    */
  private def maxFreq(arrCol: String): Column =
    expr(
      s"""aggregate(
            array_sort($arrCol),
            named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
            (acc, x) -> named_struct(
              'prev', x,
              'run',  IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1L, 1L),
              'best', GREATEST(acc.best,
                               IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1L, 1L))),
            acc -> acc.best)"""
    )

  /** Per-document repetition quality stats over whitespace tokens:
    * duplicate-word fraction, top-bigram coverage fraction (2 × max
    * bigram frequency / token count), duplicate-trigram fraction, and
    * a keep flag under the thresholds above. Adds the four columns;
    * input columns pass through untouched.
    */
  def repetitionStats(df: DataFrame, textColName: String): DataFrame = {
    df.withColumn("__toks", split(col(textColName), " "))
      .withColumn("__n", size(col("__toks")))
      .withColumn(
        "__bg",
        expr("""CASE WHEN __n < 2 THEN CAST(array() AS array<string>)
                     ELSE zip_with(slice(__toks, 1, __n - 1), slice(__toks, 2, __n - 1),
                                   (x, y) -> concat(x, ' ', y)) END""")
      )
      .withColumn(
        "__tg",
        expr("""CASE WHEN __n < 3 THEN CAST(array() AS array<string>)
                     ELSE zip_with(
                            zip_with(slice(__toks, 1, __n - 2), slice(__toks, 2, __n - 2),
                                     (x, y) -> concat(x, ' ', y)),
                            slice(__toks, 3, __n - 2),
                            (x, y) -> concat(x, ' ', y)) END""")
      )
      .withColumn(
        "dup_word_frac",
        round(lit(1.0) - size(array_distinct(col("__toks"))).cast("double") / col("__n"), 6)
      )
      .withColumn(
        "top_bigram_frac",
        round(
          when(col("__n") < 2, lit(0.0))
            .otherwise(least(lit(1.0), lit(2.0) * maxFreq("__bg").cast("double") / col("__n"))),
          6
        )
      )
      .withColumn(
        "dup_trigram_frac",
        round(
          when(col("__n") < 3, lit(0.0))
            .otherwise(
              lit(1.0) - size(array_distinct(col("__tg"))).cast("double") / (col("__n") - 2)
            ),
          6
        )
      )
      .withColumn(
        "keep",
        col("dup_word_frac") <= MaxDupWordFrac && col("top_bigram_frac") <= MaxTopBigramFrac
      )
      .drop("__toks", "__n", "__bg", "__tg")
  }

  /** Corpus-level boilerplate pruning by token document frequency:
    * a token is boilerplate when it appears in ≥ `minDfFrac` of all
    * documents; every occurrence is removed from every document.
    * Returns (doc_id-keyed frame with `clean_text` + `n_removed`,
    * sorted hot-word list). The hot list is vocabulary-bounded —
    * `maxPruneVocab` fails loudly if a pathological corpus would make
    * the broadcast literal data-sized.
    */
  def dfPrune(
      df: DataFrame,
      idColName: String,
      textColName: String,
      minDfFrac: Double,
      maxPruneVocab: Int = 100000
  ): (DataFrame, Seq[String]) = {
    val toks = df.select(explode(array_distinct(split(col(textColName), " "))).as("tok"))
    val nDocs = df.count()
    val hotWords = toks
      .groupBy("tok")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= lit(minDfFrac) * lit(nDocs))
      .select("tok")
      .collect()
      .map(_.getString(0))
      .sorted
      .toSeq
    require(
      hotWords.length <= maxPruneVocab,
      s"dfPrune hot-word list ${hotWords.length} exceeds maxPruneVocab=$maxPruneVocab — " +
        "refusing to broadcast a data-sized prune set; raise the DF threshold"
    )
    val hotArr = array(hotWords.map(lit): _*)
    val kept = filter(split(col(textColName), " "), t => !array_contains(hotArr, t))
    val out = df.select(
      col(idColName),
      array_join(kept, " ").as("clean_text"),
      (size(split(col(textColName), " ")) - size(kept)).cast("long").as("n_removed")
    )
    (out, hotWords)
  }

  val EmailRe = "[a-z0-9._-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val IpRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhoneRe = "555-[0-9]{4}"

  /** Redact emails, then IPv4s, then phone-shaped numbers. Patterns are
    * deliberately in the Java-regex ∩ RE2 dialect so the DuckDB oracle
    * replays them verbatim.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), IpRe, "<IP>"),
      PhoneRe,
      "<PHONE>"
    )

  def piiCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern)).cast("long")
}
