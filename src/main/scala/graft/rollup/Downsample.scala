package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M4 visual downsampling (Jugel et al., VLDB 2014): per (series,
  * bucket) keep the four points that pixel-perfect line rendering
  * needs — first, last, argmin, argmax of the value. Unlike LTTB
  * (whose bucket choice depends on the previous bucket's choice — an
  * inherently sequential recurrence), M4 is a plain hash aggregation:
  * partial-aggregated map-side, one shuffle of (series, bucket) keyed
  * 4-struct states, embarrassingly parallel at any corpus size — the
  * right downsample for a 100-TB engine.
  *
  * Determinism (what the SQL oracle replays): every extremum is a
  * lexicographic struct min/max, so ties resolve without ambiguity —
  * first/argmin break value ties toward the EARLIEST (ts, tieBreak),
  * last/argmax toward the LATEST. Null values must be filtered
  * upstream.
  */
object Downsample {

  /** One row per (series, bucket) with the four M4 points flattened to
    * `{first,min,max,last}_{ts,v}` columns.
    */
  def m4(
      df: DataFrame,
      series: Seq[String],
      tsCol: String,
      valueCol: String,
      tier: String,
      tieBreak: String
  ): DataFrame = {
    val byTime = struct(col(tsCol).as("ts"), col(tieBreak).as("tb"), col(valueCol).as("v"))
    val byValue = struct(col(valueCol).as("v"), col(tsCol).as("ts"), col(tieBreak).as("tb"))
    df.groupBy((series.map(col) :+ Tiers.bucket(col(tsCol), tier).as("bucket_ts")): _*)
      .agg(
        min(byTime).as("__first"),
        max(byTime).as("__last"),
        min(byValue).as("__min"),
        max(byValue).as("__max"),
        count(lit(1)).as("n_points")
      )
      .select(
        (series.map(col) :+ col("bucket_ts")) ++ Seq(
          col("__first.ts").as("first_ts"),
          col("__first.v").as("first_v"),
          col("__min.ts").as("min_ts"),
          col("__min.v").as("min_v"),
          col("__max.ts").as("max_ts"),
          col("__max.v").as("max_v"),
          col("__last.ts").as("last_ts"),
          col("__last.v").as("last_v"),
          col("n_points")
        ): _*
      )
  }
}
