package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: group each key's event stream into
  * sessions separated by inactivity longer than `gapMicros`. The batch
  * twin of Structured Streaming's `session_window` (which this engine
  * would use on a live stream); in batch form it is the standard
  * two-window composition — a lag-diff flags session starts, a running
  * sum numbers them — so the whole operator is ONE hash exchange on the
  * key plus an in-partition sort, identical to the shuffle a groupBy on
  * the key would already pay.
  *
  * Scale notes: per-key data serializes into one task's sort (fine —
  * sessions are causally ordered per key; that sort is the semantics).
  * Hot-key mitigation is upstream partitioning/salting by (key,
  * coarse-epoch) with boundary stitching; not built in. No state is
  * collected on the driver.
  *
  * Determinism: events are ordered by (ts, tieBreak) — pass a unique id
  * column so equal timestamps order reproducibly.
  */
object Sessionize {

  /** Epoch micros for TIMESTAMP or TIMESTAMP_NTZ inputs (NTZ reads —
    * e.g. parquet written as TIMESTAMP_MICROS — interpret in the
    * session timezone; this engine pins UTC, making the cast exact).
    */
  private def tsMicros(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Adds `session_idx` (1-based per key, in time order) to the input.
    * A session ends when the next event of the same key arrives more
    * than `gapMicros` after it.
    */
  def sessionize(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      gapMicros: Long,
      tieBreak: String
  ): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol).asc, col(tieBreak).asc)
    val newSession = when(
      lag(col(tsCol), 1).over(w).isNull ||
        tsMicros(col(tsCol)) - tsMicros(lag(col(tsCol), 1).over(w)) > gapMicros,
      1L
    ).otherwise(0L)
    // both windows share one partitioning+sort: Catalyst plans a single
    // Exchange + Sort and evaluates the two window functions in one pass
    df.withColumn("__new", newSession)
      .withColumn(
        "session_idx",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      )
      .drop("__new")
  }

  /** Sessionize then reduce each session to one row: start/end
    * timestamps, event count, and the given extra aggregates.
    */
  def sessions(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      gapMicros: Long,
      tieBreak: String,
      extraAggs: Seq[Column] = Seq.empty
  ): DataFrame = {
    val base: Seq[Column] = Seq(
      min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_end"),
      count(lit(1)).as("n_events")
    ) ++ extraAggs
    sessionize(df, keys, tsCol, gapMicros, tieBreak)
      .groupBy((keys.map(col) :+ col("session_idx")): _*)
      .agg(base.head, base.tail: _*)
  }
}
