package graft.snapshot

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Change-data-feed over the snapshot store — the Iceberg
  * changelog-scan / Delta CDF feature: the row-level replication
  * stream a downstream consumer (search index, feature store, cache)
  * tails instead of re-reading the table. For a snapshot range
  * (from, to] every change is emitted exactly once, labeled:
  *
  *   - data snapshots   -> their rows as `insert`
  *   - delete snapshots ([[SnapshotStore.appendDeletes]], merge-on-
  *     read) -> their KEY rows as `delete` (non-key columns null —
  *     the MoR tombstone carries only the key, by design)
  *
  * with `_snapshot_id` for ordering: replaying inserts minus deletes
  * in snapshot order reconstructs the table exactly (the q144
  * snapshot-ordering semantic — a delete only erases rows from
  * EARLIER snapshots; a later re-insert of the same key survives).
  *
  * Scale shape: manifest-driven — only the range's data dirs open
  * (day-pruned like any incremental read), one metadata pass for the
  * labels; the feed is a union of scans, no joins, no shuffle.
  */
object Changelog {

  def changes(spark: SparkSession, root: String, fromExclusive: Long, toInclusive: Long): DataFrame = {
    val ids = SnapshotStore
      .snapshotIds(root)
      .filter(id => id > fromExclusive && id <= toInclusive)
      .sorted
    require(ids.nonEmpty, s"empty changelog range ($fromExclusive, $toInclusive] in $root")
    val parts = ids.map { id =>
      val m = SnapshotStore.manifest(root, id)
      val dirs = m.get("dataDirs").elements().asScala.map(_.asText()).toSeq
      val isDelete = m.has("deleteKeyCols")
      val reader = Option(m.get("schemaJson")) match {
        case Some(sj) =>
          spark.read.schema(
            org.apache.spark.sql.types.DataType.fromJson(sj.asText()).asInstanceOf[org.apache.spark.sql.types.StructType])
        case None => spark.read
      }
      reader
        .parquet(dirs: _*)
        .withColumn("_snapshot_id", lit(id))
        .withColumn("_change_type", lit(if (isDelete) "delete" else "insert"))
    }
    parts.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
