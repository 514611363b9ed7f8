package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document keyword extraction: top-k terms ranked by an exact
  * integer tf-idf surrogate.
  *
  * Classic tf-idf scores `tf * ln(N / df)` in floating point; the
  * ranking it induces for a FIXED document is monotone in tf and
  * antitone in df, so this operator ranks by the exact integer
  * `score = tf * 1_000_000 / df` (integer division) with `(score desc,
  * token asc)` tie-break — bit-free of floats, so the DuckDB oracle
  * replays the ranking exactly. (The surrogate is NOT order-identical
  * to ln-idf across mixed tf/df trade-offs; it is a deterministic,
  * documented ranking of the same signal, which is what a pinned
  * corpus pipeline needs.)
  *
  * Scale shape: explode to `(id, token)` with an in-aggregate tf count
  * (one partial-aggregated exchange on the composite key), a second
  * partial-aggregated exchange for corpus df keyed by token, a
  * broadcast-or-shuffle hash join back on token (AQE decides — the df
  * relation is vocabulary-sized, far below the corpus), and one
  * per-document window for the top-k. No floats, no UDFs, no driver
  * collection.
  */
object Keywords {

  def topKeywords(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5,
      minTokenLen: Int = 4
  ): DataFrame = {
    val toks = graft.spark.Spread
      .cpu(df)
      .select(col(idCol).cast("long").as("id"), explode(TextOps.tokens(col(textCol))).as("token"))
      .filter(length(col("token")) >= minTokenLen)

    val tf = toks.groupBy("id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))

    val w = Window.partitionBy("id").orderBy(col("score").desc, col("token").asc)
    tf.join(dfreq, Seq("token"))
      .select(
        col("id"),
        col("token"),
        col("tf"),
        col("df"),
        // `div` = exact integer division (Spark's `/` would route
        // through double and can truncate differently at boundaries)
        expr("(tf * 1000000L) div df").as("score")
      )
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
