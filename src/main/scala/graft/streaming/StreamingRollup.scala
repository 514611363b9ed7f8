package graft.streaming

import graft.rollup.Tiers
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming face of the tier engine. The production path
  * in this sandbox is batch-incremental over Iceberg-lite snapshots
  * (SURVEY.md §1.4 — no unbounded source exists here), but the same
  * rollup semantics compose with `readStream`: watermarked
  * event-time windows produce the finest tier continuously, and the
  * batch `Rollup.reRollup` hierarchy consumes its output table.
  *
  * Scale notes: the stream aggregation is keyed by
  * (series, window(ts)) exactly like the batch tier — partial
  * aggregation per micro-batch, state bounded by the watermark
  * horizon × active series, late rows beyond the watermark dropped
  * (the batch path instead re-touches old partitions via the
  * snapshot diff; both are documented behaviors of the same tier
  * contract).
  */
object StreamingRollup {

  /** Streaming finest-tier rollup: watermark + tumbling event-time
    * window; emits (series..., bucket_ts, point_count, byte_size)
    * in append mode once a window closes.
    */
  def streamingTier(
      stream: DataFrame,
      series: Seq[String],
      tsCol: String,
      tier: String,
      watermark: String,
      sizeCol: Column
  ): DataFrame = {
    val d = Tiers.duration(tier)
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(series.map(col) :+ window(col(tsCol), d): _*)
      .agg(count(lit(1)).as("point_count"), sum(sizeCol).as("byte_size"))
      .select(
        series.map(col) :+ col("window.start").as("bucket_ts") :+
          col("point_count") :+ col("byte_size"): _*
      )
  }
}
