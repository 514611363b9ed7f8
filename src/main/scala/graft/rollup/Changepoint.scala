package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-sided CUSUM changepoint detection (Page 1954): per series, the
  * recursion `s_i = max(0, s_{i-1} + (x_i - target))` alarms when the
  * cumulative drift above `target` exceeds threshold `h` — the
  * classic "did this metric's level shift up" monitor, robust to
  * single spikes.
  *
  * The recursion is NOT folded row-by-row: with prefix sums
  * `c_i = sum_{j<=i}(x_j - target)` it closes to
  * `s_i = c_i - min(0, min_{j<=i} c_j)`, so the whole detector is two
  * stacked window frames (running sum, running min) — distributed,
  * codegen'd, and exact: x is micro-unit integers, target/h are
  * micro-unit integer parameters, every intermediate a long.
  *
  * Scale shape: one window partition per series (range-exchange keyed
  * by series, the inherent layout of per-series sequential semantics);
  * everything inside is integer window arithmetic, no UDFs, no driver
  * loops.
  */
object Changepoint {

  /** @param targetMicro reference level in micro-units (1e-6 of the
    *                    value column's unit); drift above it feeds the
    *                    CUSUM accumulator
    * @param hMicro      alarm threshold in micro-units
    * @return (series, ts, orderId, value, cusum_micro, alarm)
    */
  def cusum(
      df: DataFrame,
      seriesCol: String,
      tsCol: String,
      orderCol: String,
      valueCol: String,
      targetMicro: Long,
      hMicro: Long
  ): DataFrame = {
    val micro = (round(col(valueCol), 6).cast("decimal(16,6)") * lit(1000000)).cast("long")
    // ordered on the RENAMED columns — the window sits above the
    // normalizing projection
    val w = Window
      .partitionBy(col("series"))
      .orderBy(col("ts"), col("order_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    df.select(
        col(seriesCol).as("series"),
        col(tsCol).as("ts"),
        col(orderCol).as("order_id"),
        col(valueCol).as("value"),
        (micro - lit(targetMicro)).as("d")
      )
      .withColumn("c", sum(col("d")).over(w))
      .withColumn("floor_c", least(lit(0L), min(col("c")).over(w)))
      .select(
        col("series"),
        col("ts"),
        col("order_id"),
        col("value"),
        (col("c") - col("floor_c")).as("cusum_micro"),
        (col("c") - col("floor_c") >= hMicro).as("alarm")
      )
  }
}
