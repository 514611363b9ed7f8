package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-series Pearson correlation over bucketed series.
  *
  * The Grafana/monitoring "which metrics move together" primitive: each
  * series is first reduced to one fixed-point value per time bucket
  * (micro-units of the exact decimal sum), then every series pair is
  * correlated over the buckets both cover.
  *
  * Determinism contract (hash-exact vs the DuckDB oracle): every sum,
  * product, and co-moment is integer/decimal arithmetic — micro-unit
  * longs per bucket, `decimal(38,0)` pair statistics (values stay well
  * below 38 digits; see the bound note below). Only the final
  * `corr = (n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy - Sy^2))`
  * runs in floating point, and every double input to it is the
  * correctly-rounded image of an exact integer, so the IEEE sqrt /
  * multiply / divide chain is bit-reproducible across engines.
  *
  * Scale shape: the bucketing aggregation collapses the raw stream to
  * (#series x #buckets) rows — a single partial-aggregated exchange on
  * the composite key. The pair join shuffles only series points, keyed
  * by bucket (within one bucket there are #series rows, so the per-key
  * fan-out is #series^2 — the inherent output size of all-pairs
  * correlation, not an accident of the plan). The co-moment groupBy is
  * again partial-aggregated, so at 1000 executors the wire carries one
  * stats row per (pair, partition), never the point rows.
  *
  * Magnitude bound: micro-unit bucket sums |vi| <= ~1e13 at the bench
  * scales; with B buckets, Sxx <= B * 1e26 and n*Sxy <= B^2 * 1e26 —
  * inside decimal(38,0) (and DuckDB's int128) up to B ~ 3e5 buckets
  * (34+ years of hourly buckets). Beyond that, widen the bucket.
  */
object Correlate {

  /** Pearson correlation for every (series, series) pair sharing
    * >= `minBuckets` time buckets.
    *
    * @param bucket a `date_trunc` unit: "hour", "day", ...
    * @return (type_a, type_b, n_buckets, corr) with type_a < type_b;
    *         corr is NULL when either side is constant.
    */
  def pairwisePearson(
      df: DataFrame,
      seriesCol: String,
      tsCol: String,
      valueCol: String,
      bucket: String,
      minBuckets: Int = 2): DataFrame = {
    // per-row micro-units (exact: decimal multiply, integral result)
    val micro = (round(col(valueCol), 6).cast("decimal(16,6)") * lit(1000000)).cast("long")
    val series = df
      .groupBy(col(seriesCol).as("series"), date_trunc(bucket, col(tsCol)).as("bucket_ts"))
      .agg(sum(micro).as("vi"))

    val a = series.select(
      col("series").as("type_a"),
      col("bucket_ts"),
      col("vi").cast("decimal(38,0)").as("x"))
    val b = series.select(
      col("series").as("type_b"),
      col("bucket_ts"),
      col("vi").cast("decimal(38,0)").as("y"))

    val stats = a
      .join(b, Seq("bucket_ts"))
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy")
      )

    val n = col("n_buckets").cast("decimal(38,0)")
    val num = (n * col("sxy") - col("sx") * col("sy")).cast("double")
    val dx = (n * col("sxx") - col("sx") * col("sx")).cast("double")
    val dy = (n * col("syy") - col("sy") * col("sy")).cast("double")

    stats
      .filter(col("n_buckets") >= minBuckets)
      .select(
        col("type_a"),
        col("type_b"),
        col("n_buckets"),
        when(dx > 0 && dy > 0, num / (sqrt(dx) * sqrt(dy))).as("corr"))
  }

  /** Lagged cross-correlation — "does series B lead series A by k
    * buckets?" (alerting on upstream saturation, cache-warm effects,
    * crawl-rate → error-rate causality): Pearson over the pairs
    * `(x_t, y_{t-k})` for every requested lag k, per (A, B) series
    * pair with A < B. The |corr|-maximizing lag is the lead/lag
    * estimate; lag 0 reproduces [[pairwisePearson]].
    *
    * Same determinism contract as [[pairwisePearson]] (integer
    * micro-unit co-moments, one final IEEE float chain); the alignment
    * join runs on exact integer epoch seconds (`bucket epoch + k·width`),
    * never on shifted timestamps. Scale shape: the lag explosion
    * multiplies only the BUCKETED relation (|series|·|buckets|·|lags|
    * rows), never the raw stream; everything downstream is the same
    * partial-aggregated pair reduction.
    */
  def laggedPearson(
      df: DataFrame,
      seriesCol: String,
      tsCol: String,
      valueCol: String,
      bucket: String,
      lags: Seq[Int],
      minBuckets: Int = 2): DataFrame = {
    require(lags.nonEmpty, "need at least one lag")
    val widthSec = bucket match {
      case "minute" => 60L
      case "hour"   => 3600L
      case "day"    => 86400L
      case other    => throw new IllegalArgumentException(s"unsupported bucket '$other'")
    }
    val micro = (round(col(valueCol), 6).cast("decimal(16,6)") * lit(1000000)).cast("long")
    val series = df
      .groupBy(col(seriesCol).as("series"), date_trunc(bucket, col(tsCol)).as("bucket_ts"))
      .agg(sum(micro).as("vi"))

    val a = series.select(
      col("series").as("type_a"),
      unix_timestamp(col("bucket_ts")).as("__es"),
      col("vi").cast("decimal(38,0)").as("x"))
    val b = series
      .withColumn("lag", explode(array(lags.map(l => lit(l)): _*)))
      .select(
        col("series").as("type_b"),
        col("lag"),
        (unix_timestamp(col("bucket_ts")) + col("lag") * lit(widthSec)).as("__es"),
        col("vi").cast("decimal(38,0)").as("y"))

    val stats = a
      .join(b, Seq("__es"))
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b", "lag")
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy")
      )

    val n = col("n_buckets").cast("decimal(38,0)")
    val num = (n * col("sxy") - col("sx") * col("sy")).cast("double")
    val dx = (n * col("sxx") - col("sx") * col("sx")).cast("double")
    val dy = (n * col("syy") - col("sy") * col("sy")).cast("double")

    stats
      .filter(col("n_buckets") >= minBuckets)
      .select(
        col("type_a"),
        col("type_b"),
        col("lag"),
        col("n_buckets"),
        when(dx > 0 && dy > 0, num / (sqrt(dx) * sqrt(dy))).as("corr"))
  }
}
