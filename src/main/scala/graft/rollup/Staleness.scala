package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-series staleness detection: which series have stopped
  * reporting? The batch form of Prometheus `absent()` / a heartbeat
  * monitor — a series is stale when its last point is older than
  * `staleAfterSec` relative to the evaluation anchor.
  *
  * The anchor is the corpus-wide max timestamp (NOT wall-clock `now()`,
  * which no two engines — or two runs — share), so the result is a
  * pure function of the input.
  *
  * Scale shape: one partial-aggregated groupBy collapses the corpus to
  * #series rows; the anchor is a 1-row aggregate broadcast back over
  * them. Nothing data-sized crosses the wire twice.
  */
object Staleness {

  /** @return one row per series: (series..., last_epoch_s, n_points,
    *         age_sec, stale)
    */
  def check(
      df: DataFrame,
      series: Seq[String],
      tsCol: String,
      staleAfterSec: Long
  ): DataFrame = {
    val perSeries = df
      .groupBy(series.map(col): _*)
      .agg(
        max(unix_timestamp(col(tsCol))).as("last_epoch_s"),
        count(lit(1)).as("n_points")
      )
    val anchor = df.agg(max(unix_timestamp(col(tsCol))).as("__anchor_s"))
    perSeries
      .crossJoin(broadcast(anchor))
      .withColumn("age_sec", col("__anchor_s") - col("last_epoch_s"))
      .withColumn("stale", col("age_sec") > staleAfterSec)
      .drop("__anchor_s")
  }
}
