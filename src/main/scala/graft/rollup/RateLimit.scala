package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sliding-window rate limiting audit: for every event, how many
  * events the same key produced in the trailing window, and whether
  * that breaches the limit — the abuse/quota detector, evaluated
  * retrospectively over the log exactly as the online limiter would
  * have seen it (count includes the current event).
  *
  * Exact RANGE window over integer epoch seconds — ties INSIDE the
  * window boundary are handled by the range frame itself (all events
  * at the same second count together), so the result is
  * order-deterministic.
  *
  * Scale shape: one exchange keyed by the rate key, one in-partition
  * range-frame window — the inherent layout of per-key trailing
  * counts. Hot keys are the inherent skew of the QUESTION ("which
  * keys are hot"); for counts-only outputs at coarser grain use the
  * tier rollups instead.
  */
object RateLimit {

  /** @return input rows + (n_in_window, breach) */
  def audit(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      windowSec: Long,
      limit: Long
  ): DataFrame = {
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col("__epoch_s"))
      .rangeBetween(-(windowSec - 1), 0)

    df.withColumn("__epoch_s", unix_timestamp(col(tsCol)))
      .withColumn("n_in_window", count(lit(1)).over(w))
      .withColumn("breach", col("n_in_window") > limit)
      .drop("__epoch_s")
  }
}
