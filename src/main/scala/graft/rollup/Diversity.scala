package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-bucket Simpson diversity: `1 − Σ nᵢ² / N²` over a categorical
  * column — the corpus-health monitor ("is today's crawl still drawing
  * from many sources, or has one domain taken over?"). Simpson is
  * chosen over Shannon entropy deliberately: its sufficient statistics
  * (Σnᵢ², N) are EXACT integers, so two engines agree bit-for-bit with
  * a single shared float division at the end, while entropy's per-term
  * logarithms have no cross-engine exactness story.
  *
  * Scale shape: two stacked partial-aggregated exchanges — (bucket,
  * category) counts, then per-bucket Σn² over the category-sized
  * relation. No windows, no joins.
  */
object Diversity {

  /** @return (bucket_ts, n_total, sum_sq, simpson); simpson is null
    *         for empty... (empty buckets don't appear) and 0.0 when a
    *         single category owns the bucket
    */
  def simpson(
      df: DataFrame,
      tsCol: String,
      tier: String,
      catCol: String
  ): DataFrame =
    df.groupBy(
      Tiers.bucket(col(tsCol), tier).as("bucket_ts"),
      col(catCol).as("__cat")
    )
      .agg(count(lit(1)).as("__n"))
      .groupBy("bucket_ts")
      .agg(
        sum(col("__n")).as("n_total"),
        sum(col("__n") * col("__n")).as("sum_sq")
      )
      .withColumn(
        "simpson",
        lit(1.0) - col("sum_sq").cast("double") /
          (col("n_total").cast("double") * col("n_total").cast("double"))
      )
}
