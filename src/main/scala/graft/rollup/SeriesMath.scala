package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-series binary arithmetic: align two series on a shared time
  * grid and combine them — the batch form of PromQL's
  * `a / on(bucket) b` (error rate = errors/requests, cache hit ratio,
  * conversion rate). Alignment is the hard part: the two series have
  * different bucket sets, so the join must be FULL OUTER with explicit
  * zero/null policy, not an inner join that silently drops buckets
  * where one side is absent.
  *
  * Exactness: counts are exact integers; the ratio is the one float
  * division, null when the denominator bucket is empty (0/0 and n/0
  * are "no data", not Inf/NaN).
  *
  * Scale shape: both sides collapse to #buckets rows via
  * partial-aggregated rollups BEFORE the join, so the join inputs are
  * tier-sized (broadcast territory), never raw-event-sized.
  */
object SeriesMath {

  /** @return (bucket_ts, n_num, n_den, ratio) for the union of both
    *         series' buckets
    */
  def alignRatio(
      df: DataFrame,
      seriesCol: String,
      tsCol: String,
      tier: String,
      numSeries: String,
      denSeries: String
  ): DataFrame = {
    def counts(name: String, alias: String) =
      df.filter(col(seriesCol) === name)
        .groupBy(Tiers.bucket(col(tsCol), tier).as("bucket_ts"))
        .agg(count(lit(1)).as(alias))
    counts(numSeries, "n_num")
      .join(counts(denSeries, "n_den"), Seq("bucket_ts"), "full_outer")
      .na
      .fill(0L, Seq("n_num", "n_den"))
      .withColumn(
        "ratio",
        when(col("n_den") > 0, col("n_num").cast("double") / col("n_den").cast("double"))
      )
  }
}
