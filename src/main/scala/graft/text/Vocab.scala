package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenizer vocabulary coverage — the "how much of the corpus does a
  * fixed vocab explain" diagnostic of a training-data pipeline: build
  * the top-n token vocabulary, then score every document's
  * out-of-vocabulary (OOV) rate. High-OOV documents are the ones a
  * tokenizer will shred into bytes/unknowns — the standard cheap
  * filter signal next to [[TextOps]]' quality score, and the
  * input to vocab-size sweeps (n vs corpus OOV mass).
  *
  * Determinism: the vocabulary is the exact (count DESC, token ASC)
  * top-n — boundary ties resolve lexicographically, so the set is
  * replayable in any engine; rates are one float division of exact
  * integer counts.
  *
  * Scale shape: token counting is one partial-aggregated shuffle of
  * (token) keys; the top-n is a distributed sort-limit (Spark's
  * TakeOrderedAndProject — no single-partition window); the
  * vocabulary relation is n-sized and BROADCASTS to the corpus-side
  * membership join, so the corpus shuffles once (doc key) for the
  * per-document reduce.
  */
object Vocab {

  /** The exact (count DESC, token ASC) top-n tokens: (token, c). */
  def topTokens(df: DataFrame, textCol: String, n: Int): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token").asc)
      .limit(n)

  /** Per-document OOV stats against the corpus top-`vocabSize` vocab:
    * (idCol, n_tokens, n_oov, oov_rate).
    */
  def oovRate(df: DataFrame, idCol: String, textCol: String, vocabSize: Int): DataFrame = {
    val vocab = topTokens(df, textCol, vocabSize).select(col("token"), lit(true).as("__known"))
    df.select(col(idCol), explode(split(col(textCol), " ")).as("token"))
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__known").isNull, 1L).otherwise(0L)).as("n_oov")
      )
      .withColumn("oov_rate", col("n_oov").cast("double") / col("n_tokens"))
  }
}
