package graft.snapshot

import graft.SparkSpec
import java.nio.file.attribute.FileTime
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Table-maintenance operations: orphan-file vacuum (age-gated, never
  * touches referenced or fresh dirs) and snapshot rollback (history
  * above the target un-publishes into an audit bin; ids are reusable;
  * compacted rebases refuse).
  */
class MaintenanceSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private lazy val events =
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").cache()

  private def ageDir(path: String): Unit =
    Files.setLastModifiedTime(Paths.get(path), FileTime.fromMillis(1L))

  test("vacuum removes only aged orphan dirs; referenced and fresh dirs survive; reads unchanged") {
    val root = tmpDir("vac")
    SnapshotStore.append(root, events.filter(col("event_id") % 2 === 0))
    SnapshotStore.append(root, events.filter(col("event_id") % 2 === 1))

    // a crashed append: fully written data, no manifest
    val orphanOld = s"$root/data/s99"
    val orphanFresh = s"$root/data/s98"
    events.limit(10).write.parquet(orphanOld)
    events.limit(10).write.parquet(orphanFresh)
    ageDir(orphanOld)
    // age the REFERENCED dirs too — age alone must never doom a dir
    ageDir(s"$root/data/s1")
    ageDir(s"$root/data/s2")

    val removed = SnapshotStore.vacuum(root)
    assert(removed == Seq(orphanOld))
    assert(!Files.exists(Paths.get(orphanOld)))
    assert(Files.exists(Paths.get(orphanFresh))) // may be a live writer
    assert(SnapshotStore.read(spark, root).count() == events.count())

    // second pass with the threshold at zero collects the fresh one
    ageDir(orphanFresh)
    assert(SnapshotStore.vacuum(root, olderThanMillis = 0L) == Seq(orphanFresh))
    assert(SnapshotStore.vacuum(root).isEmpty) // idempotent when clean
  }

  test("vacuum never touches an unpublished WAP branch (staged data lives outside data/)") {
    val root = tmpDir("vacwap")
    SnapshotStore.append(root, events.filter(col("event_id") % 2 === 0))
    Wap.stage(root, events.filter(col("event_id") % 2 === 1), "pending")
    ageDir(s"$root/_wap/pending/k0")
    assert(SnapshotStore.vacuum(root, olderThanMillis = 0L).isEmpty)
    assert(Wap.auditRead(spark, root, "pending").count() == events.count())
  }

  test("rollback un-publishes snapshots above the target; ids reuse; data parks in the audit bin") {
    val root = tmpDir("rb")
    val thirds = (0 to 2).map(r => events.filter(col("event_id") % 3 === r))
    SnapshotStore.append(root, thirds(0), tsCol = Some("ts"))
    SnapshotStore.append(root, thirds(1), tsCol = Some("ts"))
    SnapshotStore.append(root, thirds(2), tsCol = Some("ts"))

    assert(SnapshotStore.rollback(root, 1L) == Seq(2L, 3L))
    assert(SnapshotStore.currentSnapshotId(root) == 1L)
    assert(SnapshotStore.read(spark, root).count() == thirds(0).count())
    // the un-published rows are parked, not destroyed
    assert(Files.exists(Paths.get(s"$root/_rolledback/r0/s2")))
    assert(Files.exists(Paths.get(s"$root/_rolledback/r0/v2.json")))

    // the freed ids are reusable: a corrected re-ingest lands at 2
    assert(SnapshotStore.append(root, thirds(2), tsCol = Some("ts")) == 2L)
    assert(SnapshotStore.read(spark, root).count() == thirds(0).count() + thirds(2).count())

    // a second rollback gets its own bin — no collision on reused ids
    assert(SnapshotStore.rollback(root, 1L) == Seq(2L))
    assert(Files.exists(Paths.get(s"$root/_rolledback/r1/s2")))

    // rollback to current is a no-op; below zero/above current raise
    assert(SnapshotStore.rollback(root, 1L).isEmpty)
    intercept[IllegalArgumentException](SnapshotStore.rollback(root, 5L))
  }

  test("rollback refuses to cross a compacted rebase") {
    val root = tmpDir("rbcomp")
    SnapshotStore.append(root, events.filter(col("event_id") % 2 === 0), tsCol = Some("ts"))
    SnapshotStore.append(root, events.filter(col("event_id") % 2 === 1), tsCol = Some("ts"))
    SnapshotStore.compact(spark, root, 2L)
    val e = intercept[IllegalArgumentException](SnapshotStore.rollback(root, 1L))
    assert(e.getMessage.contains("compacted rebase"))
    // rolling back TO the rebase id (not across it) is fine
    assert(SnapshotStore.rollback(root, 2L).isEmpty)
  }
}
