package graft.streaming

import graft.core.{DeltaCodec, GorillaCodec}
import graft.rollup.Tiers
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One raw point flowing into the streaming block builder. */
case class StreamPoint(series: String, ts: java.sql.Timestamp, value: Long)

/** Accumulating state of one open (series, hour) block. */
case class OpenBlock(epochs: Seq[Long], values: Seq[Long])

/** A finished compressed block: delta-of-delta timestamps + Gorilla
  * XOR values, exactly the columnar struct the batch tier store
  * persists (`rollup/BlockOps`).
  */
case class ClosedBlock(
    series: String,
    hour_start: java.sql.Timestamp,
    n_points: Long,
    ts_block: Array[Byte],
    val_block: Array[Byte]
)

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

  /** Streaming Gorilla/delta block builder — the custom-state path
    * built-in windowed aggregates cannot express: per (series, hour)
    * the state accumulates raw (epoch, value) points, and when the
    * event-time watermark passes the hour the state times out and ONE
    * compressed block row is emitted (points sorted by time inside
    * the block, bit-identical to the batch `BlockOps` structs). State
    * per group is bounded by an hour of points; groups die at
    * timeout, so total state is watermark horizon × active series —
    * the `flatMapGroupsWithState` sizing contract at any scale.
    *
    * Input columns: (series, ts, value).
    */
  def streamingBlocks(points: Dataset[StreamPoint], watermark: String): Dataset[ClosedBlock] = {
    implicit val stateEnc = Encoders.product[OpenBlock]
    implicit val outEnc = Encoders.product[ClosedBlock]
    implicit val keyEnc = Encoders.tuple(Encoders.STRING, Encoders.scalaLong)

    def hourStart(epochSec: Long): Long = epochSec - (epochSec % 3600)

    points
      .withWatermark("ts", watermark)
      .groupByKey(p => (p.series, hourStart(p.ts.getTime / 1000)))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: (String, Long), rows: Iterator[StreamPoint], state: GroupState[OpenBlock]) => {
          if (state.hasTimedOut) {
            // the watermark passed this hour: seal and emit the block
            val s = state.get
            val sorted = s.epochs.zip(s.values).sortBy(_._1)
            state.remove()
            Iterator.single(
              ClosedBlock(
                key._1,
                new java.sql.Timestamp(key._2 * 1000),
                sorted.size.toLong,
                DeltaCodec.encode(sorted.map(_._1).toArray),
                GorillaCodec.encode(sorted.map(_._2.toDouble).toArray)
              )
            )
          } else {
            val prev = state.getOption.getOrElse(OpenBlock(Nil, Nil))
            val pts = rows.toSeq
            state.update(
              OpenBlock(prev.epochs ++ pts.map(_.ts.getTime / 1000), prev.values ++ pts.map(_.value))
            )
            // time out once event time passes the end of this hour
            state.setTimeoutTimestamp((key._2 + 3600) * 1000)
            Iterator.empty
          }
        }
      )
  }
}
