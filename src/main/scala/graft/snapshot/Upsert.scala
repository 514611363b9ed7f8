package graft.snapshot

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Latest-wins CDC merge (upsert + tombstone delete) — the MERGE INTO
  * a snapshot table needs when a change feed replays into it: per key,
  * the row with the highest (version..., source) wins, change rows
  * beating base rows at equal version, and a winning tombstone removes
  * the key entirely.
  *
  * The winner is a single struct-max partial aggregate — (versions...,
  * source-rank, payload) compared lexicographically, so the selection
  * is deterministic even under duplicate versions (payload breaks the
  * tie) and needs ONE exchange on the key, with map-side combine
  * shrinking each partition to one candidate row per key before the
  * wire. That is the 100-TB shape: never a window sort over the full
  * history, never a join between base and changes.
  */
object Upsert {

  /** Merge `changes` into `base` (same schema). `versionCols` order the
    * rows per key (newest wins); `deleteCol` is a boolean column —
    * a winning true row deletes the key from the output.
    */
  def merge(
      base: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      versionCols: Seq[String],
      deleteCol: String): DataFrame = {
    require(base.columns.sorted.sameElements(changes.columns.sorted),
      s"base/changes schemas differ: ${base.columns.mkString(",")} vs ${changes.columns.mkString(",")}")
    require(versionCols.nonEmpty, "at least one version column is required")
    val payload = base.columns.filterNot(c => keys.contains(c))
    val rest = payload.filterNot(versionCols.contains)
    val u = base
      .withColumn("__src", lit(0))
      .unionByName(changes.withColumn("__src", lit(1)))
    val ordered = struct(
      (versionCols.map(col) :+ col("__src")) ++ rest.map(col): _*)
    u.groupBy(keys.map(col): _*)
      .agg(max(ordered).as("__w"))
      .select(keys.map(col) ++ payload.map(c => col(s"__w.$c").as(c)): _*)
      .filter(!col(deleteCol))
      .drop(deleteCol)
  }
}
