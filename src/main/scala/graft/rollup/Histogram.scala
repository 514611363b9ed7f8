package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-width value histograms per series, with cumulative counts —
  * the Prometheus classic-histogram shape (each bucket also reports
  * the count of everything at or below it), computed exactly from the
  * raw stream instead of pre-declared `le` bucket bounds.
  *
  * Everything is integer arithmetic over a deterministic bin id
  * (`floor(value / width)` — IEEE divide + floor is bit-identical
  * across engines), so results are hash-exact.
  *
  * Scale shape: one partial-aggregated exchange on (series, bin) —
  * map-side combine collapses the raw points to at most
  * (#series x #occupied-bins) rows before the wire. The cumulative
  * window then runs over those few rows per series (bins are bounded
  * by value range / width, not by data volume), so the sort inside
  * each window partition is trivial at any corpus size.
  */
object Histogram {

  /** @return (series, bin, bin_lo, bin_hi, n, cum_n) sorted semantics:
    *         cum_n = total points of this series in bins <= bin.
    */
  def fixedWidth(df: DataFrame, seriesCol: String, valueCol: String, width: Double): DataFrame = {
    require(width > 0, s"bin width must be positive, got $width")
    val bin = floor(col(valueCol) / lit(width)).cast("long")
    val counts = df
      .groupBy(col(seriesCol).as("series"), bin.as("bin"))
      .agg(count(lit(1)).as("n"))
    val cum = Window
      .partitionBy("series")
      .orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts.select(
      col("series"),
      col("bin"),
      (col("bin").cast("double") * lit(width)).as("bin_lo"),
      ((col("bin") + 1).cast("double") * lit(width)).as("bin_hi"),
      col("n"),
      sum(col("n")).over(cum).as("cum_n"))
  }

  /** Exponential (log2) histogram — the Prometheus NATIVE-histogram /
    * HDR shape: bucket width doubles each step, so a fixed number of
    * buckets covers any dynamic range with bounded relative error
    * (one octave here). The bucket id is the BIT LENGTH of the
    * micro-unit value (`length(bin(x))` = floor(log2 x) + 1) — pure
    * integer/string built-ins, so the id is exact in any engine, where
    * a float `log2` would be engine-dependent at power-of-two
    * boundaries. Non-positive values land in bucket 0 (their own
    * underflow bucket). Bounds are exact shifts: [2^(b-1), 2^b) micro.
    *
    * Scale shape: identical to [[fixedWidth]] — one partial-aggregated
    * exchange on (series, bucket); bucket count is <= 64 per series by
    * construction.
    */
  def logBuckets(df: DataFrame, seriesCol: String, valueCol: String): DataFrame = {
    val micro = (round(col(valueCol), 6).cast("decimal(16,6)") * lit(1000000)).cast("long")
    val bucket = when(micro <= 0, lit(0L)).otherwise(length(bin(micro)).cast("long"))
    df.groupBy(col(seriesCol).as("series"), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("series"),
        col("bucket"),
        when(col("bucket") === 0, lit(null).cast("long"))
          .otherwise(expr("shiftleft(1L, cast(bucket - 1 as int))"))
          .as("lo_micro"),
        when(col("bucket") === 0, lit(0L))
          .otherwise(expr("shiftleft(1L, cast(bucket as int))"))
          .as("hi_micro"),
        col("n")
      )
  }

  /** Prometheus `histogram_quantile` over [[fixedWidth]]'s buckets:
    * the quantile lands in the first bin whose cumulative count covers
    * `q * total`, linearly interpolated inside the bin (rank-based,
    * like Prometheus — not a sample interpolation).
    *
    * Deterministic: bin choice is an integer comparison against the
    * one double product `q * total` (exact inputs, one rounding), and
    * the interpolation is a fixed four-op double expression over exact
    * integers — bit-reproducible across engines.
    *
    * Scale shape: reuses the histogram's single exchange; the argmin
    * over qualifying bins is a struct-min partial aggregate over the
    * few occupied bins per series.
    */
  def histogramQuantile(
      df: DataFrame,
      seriesCol: String,
      valueCol: String,
      width: Double,
      q: Double): DataFrame = {
    require(q > 0 && q <= 1, s"quantile must be in (0, 1], got $q")
    val hist = fixedWidth(df, seriesCol, valueCol, width)
    val total = Window.partitionBy("series")
    val withTarget = hist
      .withColumn("total_n", max(col("cum_n")).over(total))
      .withColumn("target", lit(q) * col("total_n").cast("double"))
    // first qualifying bin = struct-min over (bin, payload) — one
    // partial-aggregated groupBy, no second sort
    val picked = withTarget
      .filter(col("cum_n").cast("double") >= col("target"))
      .groupBy("series")
      .agg(min(struct(col("bin"), col("bin_lo"), col("n"), col("cum_n"), col("total_n"), col("target"))).as("s"))
      .select(col("series"), col("s.*"))
    picked.select(
      col("series"),
      col("total_n"),
      col("bin"),
      (col("bin_lo") +
        lit(width) * (col("target") - (col("cum_n") - col("n")).cast("double")) / col("n").cast("double"))
        .as("quantile_est"))
  }
}
