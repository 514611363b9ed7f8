package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Threshold alerting with a hold duration — the batch form of a
  * Prometheus alert rule with `for:`: a series alerts only when the
  * condition holds on every consecutive sample across a span of at
  * least `forMicros`.
  *
  * Runs are gaps-and-islands over the (ts, tieBreak) total order: a
  * run starts at a condition-true sample whose predecessor was false
  * (or absent), a running sum of start flags numbers the runs, and a
  * run fires when `last_ts - first_ts >= forMicros`. Everything is
  * integer/timestamp/boolean arithmetic — hash-exact.
  *
  * Scale shape: one exchange + sort on the series key computes both
  * windows (lag + running sum — Catalyst fuses them over the same
  * ordering), then a partial-aggregated groupBy on (series, run_id),
  * which is clustered identically, so AQE coalesces without a second
  * wide shuffle of sample rows.
  */
object Alerts {

  /** @return one row per condition-true run:
    *         (keys..., run_id, run_start, run_end, n_samples, fired).
    */
  def thresholdFor(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String,
      threshold: Double,
      forMicros: Long,
      tieBreak: String): DataFrame = {
    require(forMicros >= 0, s"forMicros must be >= 0, got $forMicros")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol), col(tieBreak))
    val run = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cond = col(valueCol) > lit(threshold)
    val startFlag = cond && !coalesce(lag(cond, 1).over(w), lit(false))
    df.withColumn("__cond", cond)
      .withColumn("__run", sum(when(startFlag, 1L).otherwise(0L)).over(run))
      .filter(col("__cond"))
      .groupBy((keys :+ "__run").map(col): _*)
      .agg(
        min(col(tsCol)).as("run_start"),
        max(col(tsCol)).as("run_end"),
        count(lit(1)).as("n_samples"))
      .select(
        (keys.map(col) :+
          col("__run").as("run_id") :+
          col("run_start") :+
          col("run_end") :+
          col("n_samples") :+
          (unix_micros(col("run_end").cast("timestamp")) -
            unix_micros(col("run_start").cast("timestamp")) >= lit(forMicros))
            .as("fired")): _*)
  }
}
