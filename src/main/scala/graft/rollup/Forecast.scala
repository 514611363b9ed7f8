package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prometheus-style `predict_linear`: per-series least-squares line
  * over the observed points, evaluated `horizonSec` past the last
  * observation — the alerting primitive for "disk full in 4h" /
  * "error budget exhausted by Friday" forecasts.
  *
  * Determinism contract (same as [[Correlate]]): x = epoch seconds,
  * y = micro-units, all sums and co-moments exact `decimal(38,0)`;
  * slope / intercept / prediction are the only floating-point steps
  * and every double input is the correctly-rounded image of an exact
  * integer, with a fixed op order the oracle mirrors:
  * `slope = num/den`, `intercept = (sy - slope*sx)/n`,
  * `predicted = slope*x_pred + intercept`.
  *
  * Scale shape: one partial-aggregated exchange keyed by series — the
  * co-moments (n, Sx, Sy, Sxy, Sxx, max x) are all sum/max-mergeable,
  * so the wire carries one stats row per (series, partition) and the
  * fit itself is a per-row scalar epilogue. Magnitude bound: epoch
  * seconds ~2e9, so n*Sxx <= n^2 * 4e18 stays inside decimal(38,0)
  * for n up to ~5e9 points per series.
  */
object Forecast {

  /** @return (series, n_points, slope, predicted) per series with
    *         >= `minPoints` observations; slope in value-units per
    *         second, predicted = fitted value at (last ts + horizon).
    *         NULL slope/predicted for degenerate (constant-x) series.
    */
  def predictLinear(
      df: DataFrame,
      seriesCol: String,
      tsCol: String,
      valueCol: String,
      horizonSec: Long,
      minPoints: Int = 2
  ): DataFrame = {
    val x = unix_timestamp(col(tsCol)).cast("decimal(38,0)")
    val y = (round(col(valueCol), 6).cast("decimal(16,6)") * lit(1000000))
      .cast("long")
      .cast("decimal(38,0)")

    val stats = df
      .groupBy(col(seriesCol).as("series"))
      .agg(
        count(lit(1)).as("n_points"),
        sum(x).as("sx"),
        sum(y).as("sy"),
        sum((x * y).cast("decimal(38,0)")).as("sxy"),
        sum((x * x).cast("decimal(38,0)")).as("sxx"),
        max(x).as("x_max")
      )

    val n = col("n_points").cast("decimal(38,0)")
    val num = (n * col("sxy") - col("sx") * col("sy")).cast("double")
    val den = (n * col("sxx") - col("sx") * col("sx")).cast("double")
    val slope = num / den
    val intercept = (col("sy").cast("double") - slope * col("sx").cast("double")) / col("n_points").cast("double")
    val xPred = (col("x_max") + lit(horizonSec).cast("decimal(38,0)")).cast("double")

    stats
      .filter(col("n_points") >= minPoints)
      .select(
        col("series"),
        col("n_points"),
        when(den > 0, slope / lit(1e6).cast("double")).as("slope"),
        when(den > 0, (slope * xPred + intercept) / lit(1e6).cast("double")).as("predicted")
      )
  }
}
