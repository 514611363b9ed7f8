package graft.rollup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Flap detection: how often does a series cross a state boundary?
  * An alert that fires and resolves twenty times an hour is a flapping
  * alert — the per-series TRANSITION COUNT (state != previous state)
  * is the standard flappiness measure, and a threshold on it is the
  * usual hysteresis gate before paging anyone.
  *
  * Exact: the state predicate is the caller's boolean column; the
  * first point of a series is not a transition (`lag` null). All
  * integer counts.
  *
  * Scale shape: one exchange keyed by series, one in-partition lag
  * window, one partial-aggregated groupBy to #series rows.
  */
object Flap {

  /** @param state boolean column derived from the row (e.g.
    *              `col("value") > 100`)
    * @return one row per series: (series..., n_points, n_transitions,
    *         flapping)
    */
  def transitions(
      df: DataFrame,
      series: Seq[String],
      tsCol: String,
      tieBreak: String,
      state: Column,
      flapThreshold: Long
  ): DataFrame = {
    val w = Window
      .partitionBy(series.map(col): _*)
      .orderBy(col(tsCol), col(tieBreak))
    df.withColumn("__state", state)
      .withColumn(
        "__trans",
        when(lag(col("__state"), 1).over(w) =!= col("__state"), 1L).otherwise(0L)
      )
      .groupBy(series.map(col): _*)
      .agg(
        count(lit(1)).as("n_points"),
        sum(col("__trans")).as("n_transitions")
      )
      .withColumn("flapping", col("n_transitions") > flapThreshold)
  }
}
