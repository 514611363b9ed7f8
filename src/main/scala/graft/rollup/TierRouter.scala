package graft.rollup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-resolution query routing — the QUERY side of the retention
  * cascade: a dashboard asking for (time range, step) must be served
  * from the COARSEST stored tier that can express the step, touching
  * the fewest rows (a 90-day chart at 1-day resolution reads the 1d
  * tier's ~90 rows per series, never the 1m tier's ~130k).
  *
  * Correctness of the choice: every fixed-width tier bucket is an
  * epoch-anchored floor of the timestamp (date_trunc minute/hour/day
  * under the engine's pinned UTC session, and the 30d tier's explicit
  * epoch floor — `Tiers.bucket`), and the requested step re-buckets
  * with the same epoch-anchored floor — so whenever the tier width
  * DIVIDES the step, tier buckets nest exactly inside step buckets and
  * re-summing is lossless. Divisibility is therefore the whole
  * eligibility rule; no calendar cases.
  *
  * Scale shape: `serve` is one partial-aggregated groupBy over the
  * chosen tier's range-pruned rows (bucket_ts is the tier table's
  * range-partition/sort key, so the range filter prunes files). The
  * step never touches raw data.
  */
object TierRouter {

  /** The coarsest stored tier whose width divides `stepSeconds`.
    * Raises when none does (a 45-second step cannot be served from a
    * 1m-finest cascade — that needs a raw scan, which this router
    * deliberately never falls back to: silent raw scans are the
    * scale accident the tier cascade exists to prevent).
    */
  def choose(stepSeconds: Long, stored: Seq[String] = Tiers.All): String = {
    require(stepSeconds > 0, s"step must be positive, got $stepSeconds")
    val eligible = stored.filter { t =>
      val w = Tiers.widthSeconds(t)
      w <= stepSeconds && stepSeconds % w == 0
    }
    require(
      eligible.nonEmpty,
      s"no stored tier divides a $stepSeconds-second step (stored: ${stored.mkString(", ")}) — " +
        "serving it would need a raw scan; store a finer tier or change the step"
    )
    eligible.maxBy(Tiers.widthSeconds)
  }

  /** Epoch-anchored step bucket (the same floor family as `Tiers.bucket`). */
  def stepBucket(ts: Column, stepSeconds: Long): Column =
    timestamp_seconds(floor(unix_timestamp(ts) / stepSeconds).cast("long") * stepSeconds)

  /** Serve (range, step) from the chosen tier: range-prune on
    * bucket_ts, re-bucket to the epoch-anchored step, re-sum every
    * measure column (additive measures only — counts, sizes, decimal
    * sums; sketch columns re-merge through `Rollup.reRollup` instead).
    * Bounds are [fromInclusive, toExclusive) on the tier bucket.
    *
    * @param tierOf stored tier tables by name (a read of the tier
    *               root's parquet in production; any DataFrame with
    *               (series..., bucket_ts, measures...) here)
    * @return (chosen tier name, served frame)
    */
  def serve(
      tierOf: String => DataFrame,
      series: Seq[String],
      stepSeconds: Long,
      fromInclusive: java.sql.Timestamp,
      toExclusive: java.sql.Timestamp,
      stored: Seq[String] = Tiers.All
  ): (String, DataFrame) = {
    val tier = choose(stepSeconds, stored)
    val df = tierOf(tier)
      .filter(col("bucket_ts") >= lit(fromInclusive) && col("bucket_ts") < lit(toExclusive))
    val measures = df.columns.toIndexedSeq.filterNot(series.contains).filterNot(_ == "bucket_ts")
    require(measures.nonEmpty, "tier table has no measure columns")
    val keys = series.map(col) :+ stepBucket(col("bucket_ts"), stepSeconds).as("bucket_ts")
    val aggs = measures.map(c => sum(col(c)).as(c))
    (tier, df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*))
  }
}
