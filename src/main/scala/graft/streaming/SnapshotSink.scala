package graft.streaming

import graft.snapshot.SnapshotStore
import org.apache.spark.sql.DataFrame

/** Structured-Streaming → snapshot-store sink with EXACTLY-ONCE
  * appends, for `foreachBatch`:
  *
  * {{{
  * stream.writeStream
  *   .option("checkpointLocation", chk)
  *   .foreachBatch((b: DataFrame, id: Long) =>
  *     { SnapshotSink.appendBatch(root, b, id, tsCol = Some("ts")); () })
  *   .start()
  * }}}
  *
  * Structured Streaming gives foreachBatch AT-LEAST-ONCE delivery
  * with monotonically increasing batch ids: after a crash between the
  * sink's append and the checkpoint commit, the SAME batch id is
  * re-delivered with the same data. Recording the batch id in the
  * snapshot manifest turns that into exactly-once — a re-delivered
  * batch at or below the table's high-water mark is a no-op, so the
  * retry commits the checkpoint without double-appending. One stream
  * per table (the id sequence is per-query); the append itself is the
  * store's atomic manifest commit, so a crash mid-append leaves only
  * an invisible orphan dir for `vacuum` to collect.
  */
object SnapshotSink {

  /** Append one micro-batch; returns the new snapshot id, or None when
    * `batchId` was already committed (a crash-retry re-delivery).
    */
  def appendBatch(
      root: String,
      batch: DataFrame,
      batchId: Long,
      tsCol: Option[String] = None
  ): Option[Long] =
    if (batchId <= SnapshotStore.lastStreamBatchId(root)) None
    else Some(SnapshotStore.append(root, batch, tsCol, streamBatchId = Some(batchId)))
}
