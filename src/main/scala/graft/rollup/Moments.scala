package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-bucket variance from EXACT integer/decimal co-moments: one
  * partial-aggregated pass collects (n, Σx, Σx²) as exact decimals —
  * the associative, merge-order-free representation that also re-rolls
  * to coarser tiers exactly like counts — and the population variance
  * is the one float epilogue `(n·Σx² − (Σx)²) / n²`, computed from
  * bit-identical inputs by an identical expression chain in any
  * engine.
  *
  * (A naive per-row float `avg((x-mean)^2)` would be order-sensitive
  * under parallel reduction; Welford is sequential. Co-moments are the
  * scale-correct form.)
  *
  * Scale shape: exactly one exchange — the hash aggregation on
  * (series, bucket); inputs collapse map-side.
  */
object Moments {

  /** @return (series..., bucket_ts, n, sx, sxx, var_pop) with sx/sxx
    *         the exact decimal sums surfaced as doubles
    */
  def bucketVariance(
      df: DataFrame,
      series: Seq[String],
      tsCol: String,
      tier: String,
      valueCol: String
  ): DataFrame = {
    val v = round(col(valueCol), 6).cast("decimal(16,6)")
    val keys = series.map(col) :+ Tiers.bucket(col(tsCol), tier).as("bucket_ts")
    val agg = df
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(v).as("__sx"),
        sum(v * v).as("__sxx")
      )
    val nd = col("n").cast("double")
    val sx = col("__sx").cast("double")
    val sxx = col("__sxx").cast("double")
    agg
      .withColumn("sx", sx)
      .withColumn("sxx", sxx)
      .withColumn("var_pop", (nd * sxx - sx * sx) / (nd * nd))
      .drop("__sx", "__sxx")
  }
}
