package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval–point overlap join: for every right point, the left
  * intervals of the same key containing it (`start <= ts <= end`).
  * Spark's built-in planner can only run the raw range predicate as a
  * per-key cartesian (BroadcastNestedLoop / sort-merge with full
  * per-key cross), which dies at scale; this operator runs it as an
  * EQUI-join on (key, epoch):
  *
  *  - each interval is replicated into every fixed-width epoch it
  *    touches (`sequence` + `explode` — a map-side expansion whose
  *    factor is span/epochWidth, guarded below);
  *  - each point maps to exactly ONE epoch, so the equi-join meets
  *    every qualifying (interval, point) pair exactly once — no
  *    post-join dedup — and the residual `start <= ts <= end` filter
  *    is evaluated on equi-matched rows only.
  *
  * Both sides shuffle once on (key, epoch); skew falls to AQE. The
  * trade is replication for join locality — the standard time-bucketed
  * range-join strategy.
  *
  * The epoch width is a tuning knob: wider epochs replicate less but
  * match more non-overlapping pairs into the residual filter; a width
  * near the typical interval span keeps both small. `maxEpochsPerRow`
  * fails LOUDLY when one interval would fan out beyond it (a
  * year-long interval at 1-minute epochs is a 0.5M-row bomb a silent
  * default would hide).
  */
object IntervalJoin {

  /** @param intervals      left side: `keys ++ [startCol, endCol]` (+ payload)
    * @param points         right side: `keys ++ [tsCol]` (+ payload)
    * @param epochSeconds   fixed epoch width the equi-join buckets on
    * @param maxEpochsPerRow loud guard on per-interval replication
    * @return inner join: interval columns ++ point non-key columns
    */
  def overlap(
      intervals: DataFrame,
      points: DataFrame,
      keys: Seq[String],
      startCol: String,
      endCol: String,
      tsCol: String,
      epochSeconds: Long,
      maxEpochsPerRow: Long = 10000L
  ): DataFrame = {
    require(epochSeconds >= 1, s"epochSeconds must be >= 1, got $epochSeconds")
    val pointPayload = points.columns.toSeq.filterNot(keys.contains)
    val collisions = pointPayload.toSet.intersect(intervals.columns.toSet)
    require(
      collisions.isEmpty,
      s"point columns collide with interval columns: ${collisions.mkString(", ")} — rename before joining"
    )
    def epochOf(ts: Column): Column =
      floor(unix_micros(ts.cast("timestamp")) / (epochSeconds * 1000000L)).cast("long")

    val nEpochs = epochOf(col(endCol)) - epochOf(col(startCol)) + 1L
    // the guard rides the SAME scan as the explode (a filter, so
    // column pruning can't drop it): an over-wide interval fails its
    // own task with a clear error instead of silently fanning out
    val guarded = intervals
      .filter(
        when(
          nEpochs > maxEpochsPerRow,
          raise_error(
            concat(
              lit(s"IntervalJoin: an interval spans more than $maxEpochsPerRow epochs of "),
              lit(s"$epochSeconds s — widen epochSeconds or split the interval (span: "),
              nEpochs.cast("string"),
              lit(" epochs)")
            )
          ).cast("boolean")
        ).otherwise(lit(true))
      )
      .withColumn(
        "__epoch",
        explode(sequence(epochOf(col(startCol)), epochOf(col(endCol))))
      )
    val r = points.withColumn("__epoch", epochOf(col(tsCol)))
    guarded
      .join(r, keys :+ "__epoch")
      .filter(col(startCol) <= col(tsCol) && col(tsCol) <= col(endCol))
      .drop("__epoch")
  }
}
