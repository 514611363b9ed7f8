package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus frequency spectrum (Zipf profile): for each observed token
  * frequency, how many vocabulary types have it and what share of the
  * total token mass they carry — the curve corpus curation reads to
  * pick df floors/caps (how big is the hapax tail, how heavy the
  * stopword head).
  *
  * All integer: (freq, n_types, tokens_at_freq, cum_tokens) with
  * cum_tokens accumulated from the most frequent band down, so
  * `cum_tokens / total` is the head-mass curve. Two partial-aggregated
  * exchanges (token counts, then count-of-counts — the second input is
  * vocabulary-sized) and one window over the tiny spectrum relation.
  */
object CorpusStats {

  def frequencySpectrum(df: DataFrame, textCol: String): DataFrame = {
    val tf = graft.spark.Spread
      .cpu(df)
      .select(explode(TextOps.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))

    val spectrum = tf
      .groupBy("freq")
      .agg(count(lit(1)).as("n_types"))
      .select(col("freq"), col("n_types"), (col("freq") * col("n_types")).as("tokens_at_freq"))

    spectrum.withColumn(
      "cum_tokens",
      sum(col("tokens_at_freq")).over(
        Window.orderBy(col("freq").desc).rowsBetween(Window.unboundedPreceding, Window.currentRow)
      )
    )
  }

  /** Vocabulary-growth (Heaps-law) curve: scanning the corpus in doc-id
    * order in fixed-width doc buckets, how many NEW token types does
    * each bucket introduce and how big is the vocabulary after it? The
    * curve data curation reads to judge corpus diversity — a flattening
    * curve means new data is re-treading old vocabulary.
    *
    * Exact: a type is "introduced" by the minimum doc id containing it
    * (deterministic, order-free); all counts integer.
    *
    * Scale shape: token counts partial-aggregate per (token) — the
    * min-doc-id agg input is vocabulary-sized, the bucket agg input is
    * bucket-count-sized, and the running sum runs over the tiny curve
    * relation. No windows over data-sized relations.
    */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val toks = graft.spark.Spread
      .cpu(df)
      .select(col(idCol).cast("long").as("__id"), explode(TextOps.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val firstSeen = toks
      .groupBy("token")
      .agg(min(col("__id")).as("first_id"))
      .groupBy(floor(col("first_id") / bucketWidth).cast("long").as("bucket"))
      .agg(count(lit(1)).as("new_types"))
    val occurrences = toks
      .groupBy(floor(col("__id") / bucketWidth).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_tokens"))
    val curve = occurrences.join(firstSeen, Seq("bucket"), "left").na.fill(0L, Seq("new_types"))
    val run = Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    curve
      .withColumn("vocab_size", sum(col("new_types")).over(run))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(run))
  }
}
