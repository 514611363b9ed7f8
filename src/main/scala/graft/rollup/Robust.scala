package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-series outlier detection via median absolute deviation:
  * flag points with |x - median| > k * MAD. Unlike z-scores (q80), the
  * median/MAD pair does not move when the outliers themselves are
  * extreme — the standard robust monitor for spiky operational series.
  *
  * Exactness contract: "median" is the LOWER median — the value at
  * 1-based rank (n+1)/2 (integer division) in value order — so every
  * statistic is an exact micro-unit integer and the oracle replays the
  * identical rank arithmetic (no interpolated quantiles, which differ
  * by engine).
  *
  * Scale shape: JOIN-FREE — the median and MAD are attached as
  * stacked window expressions over the SAME series partitioning (rank
  * in value order, rank in deviation order, then an unordered
  * per-series max of the rank-selected value), so the whole operator
  * is one exchange keyed by series plus two in-partition sorts. All
  * integer, no UDFs. Skewed series sizes are the inherent cost of an
  * exact median (use the mergeable quantile sketch tiers, q75, when
  * approximate is enough).
  */
object Robust {

  /** @return (series, ts, order_id, value, med_micro, mad_micro,
    *          dev_micro, outlier) — one row per input point.
    */
  def madOutliers(
      df: DataFrame,
      seriesCol: String,
      tsCol: String,
      orderCol: String,
      valueCol: String,
      k: Int = 3
  ): DataFrame = {
    val micro = (round(col(valueCol), 6).cast("decimal(16,6)") * lit(1000000)).cast("long")
    val base = df.select(
      col(seriesCol).as("series"),
      col(tsCol).as("ts"),
      col(orderCol).as("order_id"),
      col(valueCol).as("value"),
      micro.as("x")
    )

    val bySeries = Window.partitionBy("series")

    // lower median of `valCol` attached to every row of its series:
    // rank in value order, mark the rank-(n+1)/2 value (integer div —
    // Spark's / is double), spread it with an unordered per-series max
    def attachLowerMedian(in: DataFrame, valCol: String, outCol: String): DataFrame = {
      val w = Window.partitionBy("series").orderBy(col(valCol), col("order_id"))
      in.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(bySeries))
        .withColumn(
          outCol,
          max(when(col("rn") === expr("(n + 1) div 2"), col(valCol))).over(bySeries)
        )
        .drop("rn", "n")
    }

    val withMed = attachLowerMedian(base, "x", "med_micro")
      .withColumn("dev_micro", abs(col("x") - col("med_micro")))
    val withMad = attachLowerMedian(withMed, "dev_micro", "mad_micro")

    withMad
      .select(
        col("series"),
        col("ts"),
        col("order_id"),
        col("value"),
        col("med_micro"),
        col("mad_micro"),
        col("dev_micro"),
        (col("dev_micro") > col("mad_micro") * k).as("outlier")
      )
  }
}
