package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Train/eval contamination check for training-data pipelines: for
  * every eval document, how much of it already appears in the training
  * corpus, measured as word-n-gram containment
  * `|shingles(eval_doc) ∩ shingles(train_corpus)| / |shingles(eval_doc)|`.
  *
  * This is the standard benchmark-leak detector (the reference corpus
  * of an eval suite must not be learnable from the training set by
  * memorization); run before every corpus release.
  *
  * Scale shape: both sides reduce to distinct `(id, shingle)` /
  * `shingle` relations; the probe is one LEFT SEMI hash join keyed by
  * the shingle string — linear in corpus size, partial-aggregated
  * counts on each side, never a doc-pair join. The train side is
  * deduplicated to one row per distinct shingle BEFORE the join, so a
  * shingle shared by millions of training docs crosses the wire once.
  * All arithmetic is integer; the flag threshold is evaluated as
  * `100 * hits >= pct * total` so the oracle reproduces it exactly.
  */
object Contamination {

  /** Per-eval-doc shingle containment against the training corpus.
    *
    * Returns `(id, n_shingles, n_hit, contaminated)` — one row per
    * eval doc that has at least one shingle (docs shorter than `n`
    * tokens have none and are omitted, like the dedup operators).
    *
    * @param thresholdPct flag docs whose containment is >= this
    *                     percentage (integer comparison, exact)
    */
  def ngramContainment(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      thresholdPct: Int = 50
  ): DataFrame = {
    val evalSh = Dedup.shingles(eval, idCol, textCol, n)
    val trainSh = Dedup.shingles(train, idCol, textCol, n)
      .select(col("shingle")).distinct()

    val hits = evalSh
      .join(trainSh, Seq("shingle"), "left_semi")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hit"))

    evalSh
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"))
      .join(hits, Seq("id"), "left_outer")
      .select(
        col("id"),
        col("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)) * 100 >= col("n_shingles") * thresholdPct)
          .as("contaminated")
      )
  }
}
