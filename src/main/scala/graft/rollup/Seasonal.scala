package graft.rollup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seasonal (hour-of-week) baselines: the per-series expected value at
  * each of the 168 weekly hours — the "seasonal naive" forecasting
  * baseline and the denominator of every "is this metric abnormal for
  * a Tuesday 3am" check.
  *
  * The hour-of-week index is pure integer epoch arithmetic
  * (`(us - us mod 3600e6) / 3600e6 mod 168`, hour 0 = the epoch's
  * Thursday 00:00 UTC) — no calendar/locale functions whose week
  * conventions differ across engines. Means are exact decimal sums
  * over exact counts (one double division), so the baseline matrix is
  * hash-exact.
  *
  * Shape: one partial-aggregated exchange on (series, hour-of-week);
  * the output is #series x 168 rows regardless of corpus size.
  */
object Seasonal {

  /** Epoch-hour index mod 168 (0 = Thursday 00:00 UTC). */
  def hourOfWeek(ts: Column): Column = {
    val us = unix_micros(ts.cast("timestamp"))
    val hourIdx = ((us - pmod(us, lit(3600000000L))) / lit(3600000000.0)).cast("long")
    pmod(hourIdx, lit(168L))
  }

  /** @return (series, hour_of_week, n, mean_value). */
  def baseline(
      df: DataFrame,
      seriesCol: String,
      tsCol: String,
      valueCol: String): DataFrame =
    df.groupBy(col(seriesCol).as("series"), hourOfWeek(col(tsCol)).as("hour_of_week"))
      .agg(
        count(lit(1)).as("n"),
        (sum(round(col(valueCol), 6).cast("decimal(28,6)")).cast("double") /
          count(lit(1)).cast("double")).as("mean_value"))

  /** Seasonal anomaly scoring: every point compared against ITS OWN
    * hour-of-week baseline — "is 3 am Sunday traffic weird FOR a 3 am
    * Sunday", which a global z-score ([[Anomaly]]) cannot ask. Rows
    * whose |value − expected| exceeds the threshold are returned with
    * the expectation and residual attached.
    *
    * Scale shape: the baseline collapses to #series × 168 rows — pure
    * broadcast territory — so the scoring pass is one broadcast hash
    * join over a single scan, no re-shuffle of the raw data. The float
    * mean/residual chain is the identical expression in the oracle.
    */
  def anomalies(
      df: DataFrame,
      seriesCol: String,
      tsCol: String,
      valueCol: String,
      threshold: Double): DataFrame = {
    require(threshold >= 0, s"threshold must be >= 0, got $threshold")
    // fresh column names on the broadcast side: baseline() derives
    // from the same df, so a name-based self-join would be ambiguous
    val base = baseline(df, seriesCol, tsCol, valueCol)
      .select(
        col("series").as("__b_series"),
        col("hour_of_week").as("__b_how"),
        col("mean_value").as("expected"))
    df.withColumn("hour_of_week", hourOfWeek(col(tsCol)))
      .join(
        broadcast(base),
        col(seriesCol) === col("__b_series") && col("hour_of_week") === col("__b_how"),
        "inner")
      .drop("__b_series", "__b_how")
      .withColumn("residual", col(valueCol) - col("expected"))
      .filter(abs(col("residual")) > threshold)
  }
}
