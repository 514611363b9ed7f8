package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-union coverage: merge possibly-overlapping per-series
  * intervals and report each merged island with its covered length —
  * the uptime/SLA primitive ("how many seconds was the service
  * actually degraded", where overlapping alerts must not double-count).
  *
  * Classic gaps-and-islands: order intervals by start, an island
  * breaks where the running max of previous ends leaves a gap, then
  * one aggregate per island. All integer (epoch seconds), exact.
  *
  * Scale shape: one exchange keyed by series (window partitioning),
  * two stacked in-partition window passes (running max, island id)
  * and a partial-aggregated groupBy on (series, island) — per-series
  * sequential semantics, the inherent layout of interval merging.
  */
object Intervals {

  /** @param df rows of (seriesCol, startSec, endSec) — epoch-second
    *           longs, end exclusive; zero/negative-length intervals
    *           are dropped
    * @return (series, island_start, island_end, covered_sec,
    *         n_intervals) — one row per merged island
    */
  def unionCoverage(
      df: DataFrame,
      seriesCol: String,
      startCol: String,
      endCol: String
  ): DataFrame = {
    val base = df
      .select(
        col(seriesCol).as("series"),
        col(startCol).cast("long").as("s"),
        col(endCol).cast("long").as("e")
      )
      .filter(col("e") > col("s"))

    val ordered = Window.partitionBy("series").orderBy(col("s"), col("e"))
    val running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    base
      // max end over all PRIOR intervals (frame excludes current row)
      .withColumn(
        "prev_max_e",
        max(col("e")).over(ordered.rowsBetween(Window.unboundedPreceding, -1))
      )
      .withColumn(
        "new_island",
        when(col("prev_max_e").isNull || col("s") > col("prev_max_e"), 1L).otherwise(0L)
      )
      .withColumn("island", sum(col("new_island")).over(running))
      .groupBy("series", "island")
      .agg(
        min(col("s")).as("island_start"),
        max(col("e")).as("island_end"),
        count(lit(1)).as("n_intervals")
      )
      .select(
        col("series"),
        col("island_start"),
        col("island_end"),
        (col("island_end") - col("island_start")).as("covered_sec"),
        col("n_intervals")
      )
  }
}
