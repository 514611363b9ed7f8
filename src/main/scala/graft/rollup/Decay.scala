package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-decayed counts (exponentially decayed heavy hitters): each
  * event contributes `2^-age_days` to its key's score as of the
  * newest day in the data — the leaderboard that prefers what is hot
  * NOW over what was hot last month, with a one-day half-life.
  *
  * Because the half-life is one day and ages are integer days, every
  * weight is an exact power of two: the score is accumulated in
  * integer units of 2^-horizon (`1 << (horizon - age)`), so the whole
  * aggregation is exact integer arithmetic — no `pow`, hash-exact —
  * and only the final human-readable score does one double division.
  * Events older than `horizonDays` weigh < 1 unit and are dropped
  * (bounded, documented truncation: they would contribute < 2^-30 of
  * a same-day event).
  *
  * Shape: the as-of day is a 1-row broadcast; the decayed sum is one
  * partial-aggregated exchange on the key.
  */
object Decay {

  /** @return (key..., n_events, decayed_units, decayed_score) where
    *         decayed_score = decayed_units / 2^horizonDays, i.e. in
    *         units of "same-day events".
    *
    *         Unit-overflow bound: the long sum holds up to
    *         2^(63-horizon) same-day events per key (~8.6e9 at the
    *         default 30) — past that, shrink `horizonDays`; the
    *         dropped tail is older and weighs even less.
    */
  def decayedCounts(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      horizonDays: Int = 30): DataFrame = {
    require(horizonDays >= 1 && horizonDays <= 62, s"horizonDays must be in [1, 62], got $horizonDays")
    val day = date_trunc("day", col(tsCol))
    val asOf = df.agg(max(day).as("as_of"))
    val aged = df
      .crossJoin(broadcast(asOf))
      .withColumn("__age", datediff(col("as_of"), day))
      .filter(col("__age") <= horizonDays)
      .withColumn(
        "__w",
        expr(s"cast(shiftleft(1L, cast($horizonDays - __age as int)) as bigint)"))
    aged
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"), sum(col("__w")).as("decayed_units"))
      .withColumn(
        "decayed_score",
        col("decayed_units").cast("double") / lit(math.pow(2.0, horizonDays)))
  }
}
