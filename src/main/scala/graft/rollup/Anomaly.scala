package graft.rollup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling z-score anomaly scoring: each point is scored against the
  * mean/stddev of its series' previous `lookback` points (the point
  * itself excluded — the score is a one-step-ahead surprise measure).
  * One hash exchange on the series key, one in-partition sort, a
  * single running frame — the same plan shape as sessionization.
  *
  * Determinism contract: the window moments are accumulated in FIXED
  * POINT (value at 1e-6, squared value at 1e-12 — both exact
  * decimals), so mean and variance are independent of partitioning;
  * the remaining double arithmetic is a fixed expression tree over
  * those exact inputs, bit-reproducible in any IEEE-754 engine (the
  * SQL oracle replays it verbatim). Variance uses the textbook
  * E[x²] − E[x]² form on exact sums — safe here because the inputs
  * are exact, not running floats.
  *
  * A point gets a null score until its series has `minPoints` prior
  * points, or when the window variance is 0 (constant history).
  */
object Anomaly {

  def rollingZ(
      df: DataFrame,
      series: Seq[String],
      tsCol: String,
      valueCol: String,
      tieBreak: String,
      lookback: Int,
      minPoints: Int,
      threshold: Double
  ): DataFrame = {
    require(lookback >= 1 && minPoints >= 2, s"need lookback >= 1 and minPoints >= 2")
    val w = Window
      .partitionBy(series.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieBreak).asc)
      .rowsBetween(-lookback.toLong, -1L)
    val vFix: Column = round(col(valueCol), 6).cast("decimal(16,6)")
    val cnt = count(col(valueCol)).over(w)
    val s1 = sum(vFix).over(w).cast("double")
    val s2 = sum((vFix * vFix).cast("decimal(33,12)")).over(w).cast("double")
    val n = cnt.cast("double")
    val mean = s1 / n
    val variance = (s2 - s1 * s1 / n) / n
    val z = (col(valueCol) - mean) / sqrt(variance)
    df.withColumn("__cnt", cnt)
      .withColumn("__mean", mean)
      .withColumn("__var", variance)
      .withColumn(
        "z",
        when(col("__cnt") >= minPoints && col("__var") > 0, z).otherwise(lit(null).cast("double"))
      )
      .withColumn("is_anomaly", when(col("z").isNotNull, abs(col("z")) > threshold))
      .drop("__cnt", "__mean", "__var")
  }
}
