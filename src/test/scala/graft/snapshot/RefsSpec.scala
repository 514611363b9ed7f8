package graft.snapshot

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class RefsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def rows(ids: Long*) = ids.map(i => (i, s"p$i")).toDF("id", "payload")

  test("tag: immutable named time travel; CAS rejects repointing") {
    val root = tmpDir("refs") + "/t"
    SnapshotStore.append(root, rows(1, 2))
    SnapshotStore.append(root, rows(3))
    Refs.tag(root, "v1", 1L)
    assert(Refs.tagId(root, "v1") == 1L)
    assert(Refs.readTag(spark, root, "v1").select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(Refs.tags(root) == Seq("v1" -> 1L))
    intercept[Exception](Refs.tag(root, "v1", 2L)) // CAS: names never repoint
    intercept[IllegalArgumentException](Refs.tag(root, "v9", 99L)) // no such snapshot
  }

  test("branch: metadata-only fork — no data bytes copied, appends invisible to main") {
    val root = tmpDir("refs") + "/b"
    SnapshotStore.append(root, rows(1, 2))
    SnapshotStore.append(root, rows(3))
    val dev = Refs.branch(root, "dev", 1L)
    // zero-copy: the branch data dir holds nothing yet, manifests only
    assert(!Files.exists(java.nio.file.Paths.get(s"$dev/data")))
    SnapshotStore.append(dev, rows(10))
    assert(SnapshotStore.read(spark, dev).select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 10L))
    // main unaffected, and advances independently
    SnapshotStore.append(root, rows(4))
    assert(SnapshotStore.read(spark, root).select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    assert(Refs.branchBase(root, "dev") == 1L)
    intercept[IllegalArgumentException](Refs.branch(root, "dev", 1L)) // already exists
  }

  test("fastForward: publishes branch snapshots onto a non-diverged main; branch stays readable") {
    val root = tmpDir("refs") + "/ff"
    SnapshotStore.append(root, rows(1, 2))
    val dev = Refs.branch(root, "dev", 1L)
    SnapshotStore.append(dev, rows(10))
    SnapshotStore.append(dev, rows(11))
    assert(Refs.fastForward(root, "dev") == Seq(2L, 3L))
    assert(SnapshotStore.currentSnapshotId(root) == 3L)
    assert(SnapshotStore.read(spark, root).select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 10L, 11L))
    // the published branch remains a readable alias of main
    assert(SnapshotStore.read(spark, dev).select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 10L, 11L))
  }

  test("fastForward: resumes a crash between the manifest CAS and the data-dir move") {
    val root = tmpDir("refs") + "/crash1"
    SnapshotStore.append(root, rows(1))
    val dev = Refs.branch(root, "dev", 1L)
    SnapshotStore.append(dev, rows(10))
    SnapshotStore.append(dev, rows(11))
    // simulate the crash: replay ONLY the first publish's manifest CAS
    // (main v2.json committed, data dir still under the branch, CURRENT
    // never advanced)
    val bm = SnapshotStore.manifest(dev, 2L).deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    bm.putArray("dataDirs").add(s"$root/data/s2")
    bm.put("fastForwardedFrom", "dev")
    SnapshotStore.atomicWrite(
      SnapshotStore.snapDir(root).resolve("v2.json"),
      new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(bm),
      replace = false
    )
    assert(SnapshotStore.currentSnapshotId(root) == 1L) // crash state: invisible half-commit
    // retry finishes the half-commit AND publishes the rest
    assert(Refs.fastForward(root, "dev") == Seq(2L, 3L))
    assert(SnapshotStore.currentSnapshotId(root) == 3L)
    assert(SnapshotStore.read(spark, root).select("id").as[Long].collect().sorted.toSeq == Seq(1L, 10L, 11L))
    assert(SnapshotStore.read(spark, dev).select("id").as[Long].collect().sorted.toSeq == Seq(1L, 10L, 11L))
  }

  test("fastForward: resumes a crash after the data-dir move but before CURRENT") {
    val root = tmpDir("refs") + "/crash2"
    SnapshotStore.append(root, rows(1))
    val dev = Refs.branch(root, "dev", 1L)
    SnapshotStore.append(dev, rows(10))
    val bm = SnapshotStore.manifest(dev, 2L).deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    bm.putArray("dataDirs").add(s"$root/data/s2")
    bm.put("fastForwardedFrom", "dev")
    SnapshotStore.atomicWrite(
      SnapshotStore.snapDir(root).resolve("v2.json"),
      new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(bm),
      replace = false
    )
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/data"))
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$dev/data/s2"),
      java.nio.file.Paths.get(s"$root/data/s2"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE
    )
    assert(Refs.fastForward(root, "dev") == Seq(2L))
    assert(SnapshotStore.currentSnapshotId(root) == 2L)
    assert(SnapshotStore.read(spark, root).select("id").as[Long].collect().sorted.toSeq == Seq(1L, 10L))
    // idempotent: a second call publishes nothing further
    assert(Refs.fastForward(root, "dev").isEmpty)
  }

  test("fastForward: a pending manifest from another writer fails loudly") {
    val root = tmpDir("refs") + "/crash3"
    SnapshotStore.append(root, rows(1))
    val dev = Refs.branch(root, "dev", 1L)
    SnapshotStore.append(dev, rows(10))
    // a foreign half-commit occupies main's next manifest slot
    Files.write(
      SnapshotStore.snapDir(root).resolve("v2.json"),
      "{\"snapshotId\":2,\"dataDirs\":[]}".getBytes
    )
    val e = intercept[IllegalArgumentException](Refs.fastForward(root, "dev"))
    assert(e.getMessage.contains("half-commit"))
  }

  test("fastForward: diverged main fails loudly") {
    val root = tmpDir("refs") + "/div"
    SnapshotStore.append(root, rows(1))
    val dev = Refs.branch(root, "dev", 1L)
    SnapshotStore.append(dev, rows(10))
    SnapshotStore.append(root, rows(2)) // main diverges
    val e = intercept[IllegalArgumentException](Refs.fastForward(root, "dev"))
    assert(e.getMessage.contains("diverged"))
    // nothing was published
    assert(SnapshotStore.read(spark, root).select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("branch of a day-partitioned table keeps pruned incremental reads") {
    val root = tmpDir("refs") + "/days"
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-02 10:00:00"))
    ).toDF("id", "ts")
    SnapshotStore.append(root, ev, tsCol = Some("ts"))
    val dev = Refs.branch(root, "dev", 1L)
    SnapshotStore.append(
      dev,
      Seq((3L, java.sql.Timestamp.valueOf("2024-01-03 10:00:00"))).toDF("id", "ts"),
      tsCol = Some("ts")
    )
    // incremental read on the branch sees exactly the branch append
    assert(SnapshotStore.readRange(spark, dev, 1L, 2L).select("id").as[Long].collect().toSeq == Seq(3L))
  }
}
