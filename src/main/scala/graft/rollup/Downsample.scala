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

  /** Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013),
    * fixed-anchor parallel variant: per (series, bucket) keep the ONE
    * point forming the largest triangle against two anchors — the
    * previous bucket's LAST point and the next bucket's FIRST point.
    * Classic LTTB anchors on the previous bucket's *selected* point,
    * a sequential recurrence that serializes the whole series; fixing
    * the anchors to bucket boundary points (the variant plotting
    * engines use for parallel render paths) makes every bucket
    * independent — a hash aggregation + a bucket-count-sized broadcast,
    * embarrassingly parallel at any corpus size, visually
    * indistinguishable for dense series.
    *
    * Determinism (what the SQL oracle replays): the doubled triangle
    * area is computed in EXACT integer arithmetic — x in epoch seconds,
    * y in micro-units (`round(value,6) * 1e6` as long, the engine-wide
    * scaling) — via the cross product
    * `|(xB-xA)(yC-yA) - (xC-xA)(yB-yA)|`; products stay far below 2^63
    * for any corpus whose time span (seconds) x value range (micros)
    * < 9e18. Area ties break toward the EARLIEST (epoch-second,
    * tieBreak) pair — the integer x that both engines share, not the
    * micro-precision ts (a same-second pair is decided by tieBreak).
    * Edge buckets anchor on themselves (first bucket: A = own first
    * point; last bucket: C = own last point), so the first/last points
    * of a monotone series are always representable. Null values must
    * be filtered upstream; `tieBreak` must be numeric and unique.
    *
    * Scale shape: one partial-aggregated shuffle builds the per-bucket
    * first/last anchor relation (|series| x |buckets| rows), a window
    * over that TINY relation shifts anchors, then the corpus joins it
    * BROADCAST and reduces with a second partial-aggregated struct-max
    * — the corpus never shuffles by anything except the bucket key.
    */
  def lttb(
      df: DataFrame,
      series: Seq[String],
      tsCol: String,
      valueCol: String,
      tier: String,
      tieBreak: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyCols = series.map(col) :+ col("bucket_ts")
    val pts = df.select(
      (series.map(col) :+ Tiers.bucket(col(tsCol), tier).as("bucket_ts")) ++ Seq(
        col(tsCol).as("__ts"),
        col(tieBreak).as("__tb"),
        col(valueCol).as("__v"),
        unix_timestamp(col(tsCol)).as("__x"),
        (round(col(valueCol), 6).cast("decimal(16,6)") * lit(1000000)).cast("long").as("__y")
      ): _*
    )
    // (ts, tieBreak)-lexicographic endpoints of every bucket
    val byTime = struct(col("__ts").as("ts"), col("__tb").as("tb"), col("__x").as("x"), col("__y").as("y"))
    val wSeries = Window.partitionBy(series.map(col): _*).orderBy(col("bucket_ts"))
    val anchors = pts
      .groupBy(keyCols: _*)
      .agg(min(byTime).as("__first"), max(byTime).as("__last"))
      .withColumn("__a", coalesce(lag(col("__last"), 1).over(wSeries), col("__first")))
      .withColumn("__c", coalesce(lead(col("__first"), 1).over(wSeries), col("__last")))
      .select(keyCols :+ col("__a") :+ col("__c"): _*)

    val area2 = abs(
      (col("__x") - col("__a.x")) * (col("__c.y") - col("__a.y")) -
        (col("__c.x") - col("__a.x")) * (col("__y") - col("__a.y"))
    )
    // struct max = largest area, then earliest (ts, tieBreak) via negated keys
    val ranked = struct(
      area2.as("a2"),
      (-col("__x")).as("nx"),
      (-col("__tb")).as("ntb"),
      col("__ts").as("ts"),
      col("__tb").as("tb"),
      col("__v").as("v")
    )
    pts
      .join(broadcast(anchors), series :+ "bucket_ts")
      .groupBy(keyCols: _*)
      .agg(max(ranked).as("__sel"), count(lit(1)).as("n_points"))
      .select(
        keyCols ++ Seq(
          col("__sel.ts").as("sel_ts"),
          col("__sel.tb").as(tieBreak),
          col("__sel.v").as("sel_v"),
          col("__sel.a2").as("area2"),
          col("n_points")
        ): _*
      )
  }
}
