package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-bucket rate limiting audit — the ONLINE limiter's semantics
  * (burst capacity + steady refill), replayed over the log. Complements
  * [[RateLimit]] (sliding-window count): a token bucket permits bursts
  * up to `cap` and then throttles to the refill rate, which is what
  * production limiters (nginx, envoy, API gateways) actually do.
  *
  * Deficit formulation, audit semantics (every request debits, the
  * standard retrospective form): after event i of a key,
  *
  *   deficit_i = max(0, deficit_{i-1} − r·Δt_i) + c
  *   allowed_i = deficit_i ≤ cap
  *
  * The max(0,·) recursion is NOT folded sequentially — like
  * [[Changepoint.cusum]] it closes to prefix arithmetic: with
  * g_i = c − r·Δt_i (Δt_1 = 0) and S the running sum of g,
  * deficit_i = c + S_i − min_{j≤i} S_j — two stacked windows over the
  * same (series, ts, tie) sort, all exact integers in micro-tokens
  * (r·Δt multiplies a micro rate by whole seconds).
  *
  * Scale shape: one exchange keyed by the rate key, one in-partition
  * sort shared by the lag/sum/min windows.
  */
object TokenBucket {

  /** @param ratePerSecMicro refill rate in micro-tokens per second
    * @param capMicro        bucket capacity in micro-tokens
    * @param costMicro       tokens debited per event (default 1 token)
    * @return (series, ts, order_id, deficit_micro, allowed)
    */
  def audit(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      orderCol: String,
      ratePerSecMicro: Long,
      capMicro: Long,
      costMicro: Long = 1000000L
  ): DataFrame = {
    require(ratePerSecMicro > 0, s"rate must be positive, got $ratePerSecMicro")
    require(capMicro >= costMicro, s"cap $capMicro must cover one cost $costMicro")
    val ordered = Window.partitionBy(col("series")).orderBy(col("ts"), col("order_id"))
    val running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    df.select(
        col(keyCol).as("series"),
        col(tsCol).as("ts"),
        col(orderCol).as("order_id"),
        unix_timestamp(col(tsCol)).as("__es")
      )
      .withColumn(
        "__g",
        lit(costMicro) -
          lit(ratePerSecMicro) * (col("__es") - coalesce(lag(col("__es"), 1).over(ordered), col("__es")))
      )
      .withColumn("__s", sum(col("__g")).over(running))
      .withColumn(
        "deficit_micro",
        lit(costMicro) + col("__s") - min(col("__s")).over(running)
      )
      .withColumn("allowed", col("deficit_micro") <= capMicro)
      .drop("__es", "__g", "__s")
  }
}
