package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Biggest movers: which series changed the most between the first and
  * second half of the time range? The "what changed" triage query —
  * run after an incident or a release to rank series by activity
  * delta.
  *
  * The split point is the midpoint of the data's own [min, max] epoch
  * range (floor integer mean — a pure function of the input, no wall
  * clock); `ts <= mid` counts as "before". All integer counts and
  * deltas; ranking is by absolute delta descending with the series key
  * as the total-order tie-break, so top-k is deterministic.
  *
  * Scale shape: one partial-aggregated groupBy collapses the corpus to
  * #series rows with per-side conditional counts (one scan, not two);
  * the 1-row range anchor broadcasts; top-k is a TakeOrdered over the
  * series-sized relation (never a global sort of raw data).
  */
object Movers {

  def topMovers(
      df: DataFrame,
      series: Seq[String],
      tsCol: String,
      k: Int
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val es = unix_timestamp(col(tsCol))
    val anchor = df.agg(
      ((min(es) + max(es)) - pmod(min(es) + max(es), lit(2L))).divide(lit(2L))
        .cast("long")
        .as("__mid_s")
    )
    val counted = df
      .withColumn("__es", es)
      .crossJoin(broadcast(anchor))
      .groupBy(series.map(col): _*)
      .agg(
        sum(when(col("__es") <= col("__mid_s"), 1L).otherwise(0L)).as("n_before"),
        sum(when(col("__es") > col("__mid_s"), 1L).otherwise(0L)).as("n_after")
      )
      .withColumn("delta", col("n_after") - col("n_before"))
      .withColumn("abs_delta", abs(col("delta")))
    counted
      .orderBy(col("abs_delta").desc +: series.map(c => col(c).asc): _*)
      .limit(k)
  }
}
