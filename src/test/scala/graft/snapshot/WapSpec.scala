package graft.snapshot

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Write-Audit-Publish branches: staged rows are invisible to main
  * until publish, the audit view is main ∪ staged, publish promotes
  * stages in order with CAS protection, stale branches raise, discard
  * leaves no trace, and a crashed publish resumes idempotently.
  */
class WapSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private lazy val events =
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").cache()

  test("stage is invisible to main; audit = main ∪ staged; publish promotes in order") {
    val root = tmpDir("wap")
    val base = events.filter(col("event_id") % 3 === 0)
    val s1 = events.filter(col("event_id") % 3 === 1)
    val s2 = events.filter(col("event_id") % 3 === 2)
    SnapshotStore.append(root, base, tsCol = Some("ts"))

    assert(Wap.stage(root, s1, "ingest", tsCol = Some("ts")) == 0)
    assert(Wap.stage(root, s2, "ingest", tsCol = Some("ts")) == 1)
    // main readers see none of it
    assert(SnapshotStore.read(spark, root).count() == base.count())
    // the audit view sees everything that WOULD become visible
    assert(Wap.auditRead(spark, root, "ingest").count() == events.count())

    val ids = Wap.publish(root, "ingest")
    assert(ids == Seq(2L, 3L))
    assert(SnapshotStore.currentSnapshotId(root) == 3L)
    assert(SnapshotStore.read(spark, root).count() == events.count())
    // stage order is snapshot order: incremental readers see s1 then s2
    assert(SnapshotStore.readRange(spark, root, 1L, 2L).count() == s1.count())
    assert(SnapshotStore.readRange(spark, root, 2L, 3L).count() == s2.count())
    // published snapshots carry day metadata (pruned reads still work)
    assert(SnapshotStore.hasDayInfo(root, 1L, 3L))
    // nothing staged remains
    assert(Wap.stages(root, "ingest").isEmpty)
    assert(!Files.exists(Paths.get(s"$root/_wap/ingest")))
  }

  test("stale branch raises when main advances past the base; discard removes all trace") {
    val root = tmpDir("wapstale")
    SnapshotStore.append(root, events.filter(col("event_id") % 2 === 0))
    Wap.stage(root, events.filter(col("event_id") % 4 === 1), "late")
    // main advances AFTER staging — the branch base is gone
    SnapshotStore.append(root, events.filter(col("event_id") % 4 === 3))
    val e = intercept[IllegalArgumentException](Wap.publish(root, "late"))
    assert(e.getMessage.contains("stale"))
    // audit still works (it reads CURRENT main + staged)
    assert(Wap.auditRead(spark, root, "late").count() == events.count())
    Wap.discard(root, "late")
    assert(Wap.stages(root, "late").isEmpty)
    intercept[IllegalArgumentException](Wap.auditRead(spark, root, "late"))
    assert(SnapshotStore.read(spark, root).count() ==
      events.filter(col("event_id") % 4 =!= 1).count())
  }

  test("crashed publish resumes: committed manifest without CURRENT advance is finished, not re-raised") {
    val root = tmpDir("wapresume")
    val base = events.filter(col("event_id") % 2 === 0)
    val staged = events.filter(col("event_id") % 2 === 1)
    SnapshotStore.append(root, base)
    Wap.stage(root, staged, "b")

    // simulate the narrowest crash window: manifest CAS committed,
    // data not yet moved, stage manifest intact, CURRENT not advanced
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val m = mapper.createObjectNode()
    m.put("snapshotId", 2L)
    m.put("parentId", 1L)
    m.put("rows", staged.count())
    m.put("schemaJson", staged.schema.json)
    m.put("wapBranch", "b")
    m.put("wapStage", 0)
    m.putArray("dataDirs").add(s"$root/data/s2")
    SnapshotStore.atomicWrite(
      SnapshotStore.snapDir(root).resolve("v2.json"),
      mapper.writeValueAsString(m),
      replace = false)
    assert(SnapshotStore.currentSnapshotId(root) == 1L) // reader-invisible

    val ids = Wap.publish(root, "b")
    assert(ids == Seq(2L))
    assert(SnapshotStore.currentSnapshotId(root) == 2L)
    assert(SnapshotStore.read(spark, root).count() == events.count())
    // re-publish of a fully consumed branch has nothing to do
    intercept[IllegalArgumentException](Wap.publish(root, "b"))
  }

  test("foreign CAS winner raises instead of silently adopting the id") {
    val root = tmpDir("wapforeign")
    SnapshotStore.append(root, events.filter(col("event_id") % 2 === 0))
    Wap.stage(root, events.filter(col("event_id") % 2 === 1), "mine")
    // a FOREIGN (non-WAP) writer committed id 2 without advancing
    // CURRENT yet (mid-append) — publish must not claim it
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val m = mapper.createObjectNode()
    m.put("snapshotId", 2L)
    m.put("parentId", 1L)
    m.put("rows", 0L)
    m.putArray("dataDirs").add(s"$root/data/s2")
    SnapshotStore.atomicWrite(
      SnapshotStore.snapDir(root).resolve("v2.json"),
      mapper.writeValueAsString(m),
      replace = false)
    intercept[java.util.ConcurrentModificationException](Wap.publish(root, "mine"))
  }
}
