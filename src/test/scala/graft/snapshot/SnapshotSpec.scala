package graft.snapshot

import graft.SparkSpec
import graft.rollup.Rollup
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iceberg-lite snapshot store + continuous aggregate tests:
  * incremental tier updates over two appends must equal a one-pass
  * recompute; updates are resumable/idempotent after a simulated crash
  * (lost `_applied` marker); late data re-touches old partitions.
  */
class SnapshotSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private lazy val events =
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").cache()

  private def fullTier(df: DataFrame, tier: String): DataFrame =
    Rollup.fromRaw(df, Seq("event_type"), "ts", tier, lit(1L))

  test("append/read roundtrip with snapshot ids and incremental range reads") {
    val root = tmpDir("snap")
    val b1 = events.filter(col("ts") < "2024-01-15")
    val b2 = events.filter(col("ts") >= "2024-01-15")
    val id1 = SnapshotStore.append(root, b1)
    val id2 = SnapshotStore.append(root, b2)
    assert(id1 == 1L && id2 == 2L && SnapshotStore.currentSnapshotId(root) == 2L)
    assert(SnapshotStore.read(spark, root).count() == events.count())
    assert(SnapshotStore.readRange(spark, root, 1L, 2L).count() == b2.count())
  }

  test("incremental tier update over two snapshots == one-pass recompute") {
    val root = tmpDir("snap_src")
    val tiers = tmpDir("snap_tiers")
    // overlapping days across the two batches -> second update
    // re-touches partitions written by the first (late data path)
    val b1 = events.filter(col("event_id") % 2 === 0)
    val b2 = events.filter(col("event_id") % 2 === 1)

    SnapshotStore.append(root, b1)
    val a1 = ContinuousRollup.update(spark, root, tiers, Seq("event_type"), "ts", lit(1L))
    assert(a1 == 1L)

    SnapshotStore.append(root, b2)
    val a2 = ContinuousRollup.update(spark, root, tiers, Seq("event_type"), "ts", lit(1L))
    assert(a2 == 2L)

    for (t <- Seq("1m", "1h", "1d", "30d")) {
      val got = ContinuousRollup.readTier(spark, tiers, t)
      val want = fullTier(events, t)
      assert(got.except(want).isEmpty && want.except(got).isEmpty, s"tier $t mismatch")
    }

    // lineage + metrics recorded
    val lineage = spark.read.parquet(s"$tiers/_lineage")
    assert(lineage.count() == 8) // 4 tiers x 2 updates
    assert(spark.read.parquet(s"$tiers/_metrics").count() == 2)
  }

  test("update is a no-op when nothing is new, and resumes after a lost marker") {
    val root = tmpDir("snap_src2")
    val tiers = tmpDir("snap_tiers2")
    SnapshotStore.append(root, events)
    ContinuousRollup.update(spark, root, tiers, Seq("event_type"), "ts", lit(1L))
    val before = ContinuousRollup.readTier(spark, tiers, "1h").collect().toSet

    // no-op
    assert(ContinuousRollup.update(spark, root, tiers, Seq("event_type"), "ts", lit(1L)) == 1L)

    // simulated crash: marker lost after tier writes -> re-run must be
    // idempotent and restore the marker
    Files.delete(Paths.get(tiers, "_applied"))
    assert(ContinuousRollup.lastApplied(tiers) == 0L)
    ContinuousRollup.update(spark, root, tiers, Seq("event_type"), "ts", lit(1L))
    assert(ContinuousRollup.lastApplied(tiers) == 1L)
    val after = ContinuousRollup.readTier(spark, tiers, "1h").collect().toSet
    assert(after == before)
  }
}
