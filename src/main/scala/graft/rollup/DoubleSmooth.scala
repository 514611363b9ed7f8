package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-lookback Holt double exponential smoothing (level + trend)
  * at alpha = beta = 1/2 — the trend-aware upgrade of [[Smooth]]'s
  * EWMA: a series that is steadily climbing smooths WITH the climb
  * instead of lagging it, and the (level + trend) one-step forecast is
  * the natural "where should the next point be" anomaly reference.
  *
  *   l_i = (x_i + l_{i-1} + b_{i-1}) / 2
  *   b_i = (l_i - l_{i-1}) / 2 + b_{i-1} / 2
  *       = (x_i - l_{i-1} + 3 b_{i-1}) / 4
  *
  * Exactness: the fold runs on micro-unit integers pre-scaled by
  * 4^(lookback-1); each of the <= lookback-1 steps divides by 2 or 4
  * and the scaling keeps every intermediate an EXACT integer
  * (divisibility by 4^(remaining steps) is invariant), so the whole
  * recursion is integer arithmetic with shifts — bit-identical in any
  * engine — and only the final unscaling to level/trend/forecast is a
  * float division of exact integers. Init: l = first value, b = 0.
  *
  * Scale shape: identical to [[Smooth.ewma]] — one exchange + sort on
  * the series key, then a per-row fold over a bounded list; state
  * bounded by the lookback, never by series length.
  */
object DoubleSmooth {

  def holt(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String,
      tieBreak: String,
      lookback: Int = 8
  ): DataFrame = {
    require(lookback >= 1 && lookback <= 16, s"lookback must be in [1,16], got $lookback")
    val scale = math.pow(4.0, (lookback - 1).toDouble).toLong // exact for lookback <= 16
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tieBreak))
      .rowsBetween(-(lookback - 1), Window.currentRow)

    val micro = (round(col(valueCol), 6).cast("decimal(16,6)") * lit(1000000)).cast("long")
    val vals = collect_list(micro).over(w)
    val tail = slice(col("__vals"), lit(2), size(col("__vals")) - 1)
    val init = struct(
      (element_at(col("__vals"), 1) * scale).as("l"),
      lit(0L).as("b")
    )
    val folded = aggregate(
      tail,
      init,
      (acc, x) =>
        struct(
          shiftright(x * scale + acc.getField("l") + acc.getField("b"), 1).as("l"),
          shiftright(x * scale - acc.getField("l") + lit(3L) * acc.getField("b"), 2).as("b")
        )
    )

    val s = lit(scale.toDouble * 1e6) // unscale fold scale AND micro-units
    df.withColumn("__vals", vals)
      .withColumn("__st", folded)
      .withColumn("level", col("__st").getField("l").cast("double") / s)
      .withColumn("trend", col("__st").getField("b").cast("double") / s)
      .withColumn(
        "forecast",
        (col("__st").getField("l") + col("__st").getField("b")).cast("double") / s
      )
      .withColumn("n_window", size(col("__vals")).cast("long"))
      .drop("__vals", "__st")
  }
}
