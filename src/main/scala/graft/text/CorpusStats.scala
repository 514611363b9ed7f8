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
}
