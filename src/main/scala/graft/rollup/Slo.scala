package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multiwindow SLO burn-rate alerting (the Google SRE error-budget
  * pattern): the error rate is measured over a short and a long
  * window simultaneously, each divided by the budget rate, and the
  * alert fires only when BOTH burn rates exceed their thresholds —
  * the short window gives fast detection, the long window suppresses
  * blips.
  *
  * All rates are exact-integer count ratios (one double division
  * each), so results are hash-exact. Shape: two partial-aggregated
  * bucket rollups (hour and day) + a join of each hour to its day —
  * the day side is #days rows, broadcast territory at any scale.
  */
object Slo {

  /** @return per hour: (bucket_ts, n_errors, n_total, burn_short,
    *         burn_long, alert) where burn = (errors/total)/budgetRate.
    */
  def burnRate(
      df: DataFrame,
      tsCol: String,
      isErrorCol: String,
      budgetRate: Double,
      shortThreshold: Double,
      longThreshold: Double): DataFrame = {
    require(budgetRate > 0 && budgetRate <= 1, s"budgetRate must be in (0,1], got $budgetRate")
    val flagged = df.select(
      date_trunc("hour", col(tsCol)).as("bucket_ts"),
      date_trunc("day", col(tsCol)).as("day_ts"),
      col(isErrorCol).cast("long").as("is_err"))
    val hourly = flagged
      .groupBy("bucket_ts", "day_ts")
      .agg(sum(col("is_err")).as("n_errors"), count(lit(1)).as("n_total"))
    val daily = flagged
      .groupBy(col("day_ts"))
      .agg(sum(col("is_err")).as("d_errors"), count(lit(1)).as("d_total"))
    val burnS =
      col("n_errors").cast("double") / col("n_total").cast("double") / lit(budgetRate)
    val burnL =
      col("d_errors").cast("double") / col("d_total").cast("double") / lit(budgetRate)
    hourly
      .join(daily, Seq("day_ts"))
      .select(
        col("bucket_ts"),
        col("n_errors"),
        col("n_total"),
        burnS.as("burn_short"),
        burnL.as("burn_long"),
        (burnS >= lit(shortThreshold) && burnL >= lit(longThreshold)).as("alert"))
  }
}
