package graft.rollup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Counter-rate and time-weighted-average tier measures — the two
  * monitoring-style aggregates (Prometheus `increase`/`rate`,
  * TimescaleDB `time_weight`) the rollup engine needs for cumulative
  * counters and irregularly-sampled gauges, where a plain `sum`/`avg`
  * per bucket answers the wrong question.
  *
  * Both are window-then-aggregate compositions: ONE hash exchange on
  * the series key (the per-bucket reduce reuses that clustering — the
  * bucket is a function of rows already co-located by key, so Catalyst
  * plans no second exchange), in-partition sort, codegen expressions
  * throughout. Per-series data serializes into one task's sort, the
  * same causal-order constraint sessionization carries; hot-series
  * mitigation is upstream epoch-salting with boundary stitching.
  *
  * Determinism contract (what lets the DuckDB oracle replay bucket
  * values hash-exactly): per-row deltas/weights are pure expressions
  * under the (ts, tieBreak) total order, and the per-bucket reduce
  * sums them in fixed point (round at 1e-6 → DECIMAL) so the result is
  * independent of partitioning and merge order — the same contract the
  * engine's other double-summing queries use.
  */
object RateOps {

  /** Epoch micros for TIMESTAMP or TIMESTAMP_NTZ (exact under the
    * engine's pinned UTC session timezone).
    */
  private def tsMicros(c: Column): Column = unix_micros(c.cast("timestamp"))

  private def fixedPoint(c: Column): Column =
    round(c, 6).cast("decimal(28,6)")

  /** Adds `delta`: the counter increase this sample contributes, under
    * Prometheus reset semantics — a drop in the raw counter means the
    * process restarted and re-counted from zero, so the whole new
    * value is growth. The first sample of a series contributes null
    * (no prior observation to difference against).
    */
  def counterDeltas(
      df: DataFrame,
      series: Seq[String],
      tsCol: String,
      valueCol: String,
      tieBreak: String
  ): DataFrame = {
    val w = Window.partitionBy(series.map(col): _*).orderBy(col(tsCol).asc, col(tieBreak).asc)
    val prev = lag(col(valueCol), 1).over(w)
    df.withColumn(
      "delta",
      when(prev.isNull, lit(null).cast("double"))
        .when(col(valueCol) >= prev, col(valueCol) - prev)
        .otherwise(col(valueCol))
    )
  }

  /** Per-(series, bucket) counter increase and per-second rate at a
    * tier. A delta is attributed to the bucket of its LATER sample
    * (the observation that revealed the growth — Prometheus's rule).
    * Buckets whose samples all carried null deltas (a series' first
    * bucket with a single sample) report increase 0.
    */
  def increase(
      df: DataFrame,
      series: Seq[String],
      tsCol: String,
      valueCol: String,
      tier: String,
      tieBreak: String
  ): DataFrame = {
    val width = Tiers.widthSeconds(tier)
    counterDeltas(df, series, tsCol, valueCol, tieBreak)
      .groupBy((series.map(col) :+ Tiers.bucket(col(tsCol), tier).as("bucket_ts")): _*)
      .agg(
        coalesce(sum(fixedPoint(col("delta"))), lit(0).cast("decimal(28,6)"))
          .cast("double")
          .as("increase"),
        count(col("delta")).as("n_deltas")
      )
      .withColumn("rate_per_sec", col("increase") / lit(width.toDouble))
  }

  /** Per-(series, bucket) time-weighted average of an irregularly
    * sampled gauge: each sample holds (LOCF) until the next sample in
    * the same bucket, the bucket's last sample holds to the bucket
    * end. Coverage runs from the bucket's FIRST sample to the bucket
    * end — buckets are self-contained (no value carried across bucket
    * boundaries), which is what keeps the measure computable in one
    * pass and lets gap-fill own the empty-bucket story. Equal
    * timestamps order by `tieBreak`; the earlier duplicate gets zero
    * weight. Null values must be filtered upstream.
    *
    * Output: `twa` (double), `covered_us` (the weighted span,
    * bucket_end − first_ts in micros).
    */
  def timeWeightedAvg(
      df: DataFrame,
      series: Seq[String],
      tsCol: String,
      valueCol: String,
      tier: String,
      tieBreak: String
  ): DataFrame = {
    val bucket = Tiers.bucket(col(tsCol), tier)
    val withBucket = df.withColumn("__bucket", bucket)
    val w = Window
      .partitionBy((series.map(col) :+ col("__bucket")): _*)
      .orderBy(col(tsCol).asc, col(tieBreak).asc)
    val bucketEndUs =
      tsMicros(col("__bucket")) + lit(Tiers.widthSeconds(tier) * 1000000L)
    val nextTs = lead(col(tsCol), 1).over(w)
    val weightUs =
      coalesce(tsMicros(nextTs), bucketEndUs) - tsMicros(col(tsCol))
    val weighted = withBucket
      .withColumn("__w_us", weightUs)
      // decimal(16,6) value × decimal(14,0) micros → decimal(31,6):
      // exact fixed point within BOTH engines' 38-digit ceiling (a 30d
      // bucket spans 2.6e12 us; values hold 10 integer digits),
      // partition- and merge-order-free under decimal addition
      .withColumn(
        "__vw",
        round(col(valueCol), 6).cast("decimal(16,6)") * col("__w_us").cast("decimal(14,0)")
      )
    weighted
      .groupBy((series.map(col) :+ col("__bucket").as("bucket_ts")): _*)
      .agg(
        (sum(col("__vw")).cast("double") / sum(col("__w_us")).cast("double")).as("twa"),
        sum(col("__w_us")).as("covered_us")
      )
  }
}
