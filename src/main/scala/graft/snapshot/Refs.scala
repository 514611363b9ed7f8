package graft.snapshot

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Named refs over the snapshot store — Iceberg's tag/branch model:
  *
  *   - a TAG is an immutable name for one snapshot id ("v1",
  *     "audited-2024-01-31"): time travel by name instead of by raw
  *     id, CAS-created so a name can never be silently repointed;
  *   - a BRANCH is a zero-copy FORK of the table at a snapshot: its
  *     own `_refs/<name>/` snapshot store whose manifests for the
  *     shared prefix are verbatim copies of main's (manifests carry
  *     absolute data-dir paths, so NO data bytes move — the fork cost
  *     is one small JSON file per shared snapshot, exactly Iceberg's
  *     metadata-only branch). Appends to the branch land under the
  *     branch root and are invisible to main; every reader
  *     (read/readRange/readAsOf/rollback) works on a branch root
  *     unchanged because a branch IS a snapshot store.
  *
  * FAST-FORWARD publishes a branch whose fork base is still main's
  * head: each branch-only snapshot's data dir moves into main's
  * `data/`, its manifest is CAS-committed, and CURRENT advances —
  * the same crash-resumable commit shape as [[Wap.publish]]. A
  * diverged main (head != fork base) fails the publish loudly: a
  * silent three-way merge would interleave histories.
  *
  * This complements [[Wap]]: WAP is the short-lived audit gate for a
  * producer's next batch; Refs are durable names — release tags for
  * reproducible reads, long-lived dev/backfill branches.
  */
object Refs {

  private val mapper = new ObjectMapper()

  private def refsDir(root: String): Path = SnapshotStore.snapDir(root).resolve("refs")

  private def tagPath(root: String, name: String): Path = {
    require(name.matches("[A-Za-z0-9._-]+"), s"ref name must be [A-Za-z0-9._-]+, got '$name'")
    refsDir(root).resolve(s"$name.json")
  }

  def branchRoot(root: String, name: String): String = {
    require(name.matches("[A-Za-z0-9._-]+"), s"ref name must be [A-Za-z0-9._-]+, got '$name'")
    s"$root/_refs/$name"
  }

  /** CAS-create an immutable tag for snapshot `id`. */
  def tag(root: String, name: String, id: Long): Unit = {
    require(id >= 1 && id <= SnapshotStore.currentSnapshotId(root), s"tag '$name': no snapshot $id in $root")
    val m: ObjectNode = mapper.createObjectNode()
    m.put("name", name)
    m.put("type", "tag")
    m.put("snapshotId", id)
    m.put("commitMillis", System.currentTimeMillis())
    SnapshotStore.atomicWrite(tagPath(root, name), mapper.writeValueAsString(m), replace = false)
  }

  def tagId(root: String, name: String): Long =
    mapper.readTree(Files.readAllBytes(tagPath(root, name))).get("snapshotId").asLong()

  def tags(root: String): Seq[(String, Long)] =
    if (!Files.exists(refsDir(root))) Seq.empty
    else {
      // materialize inside try/finally — Files.list leaks a directory
      // fd until closed (same convention as Wap.stages / Retention)
      val s = Files.list(refsDir(root))
      try
        s.iterator()
          .asScala
          .filter(_.getFileName.toString.endsWith(".json"))
          .map { p =>
            val n = mapper.readTree(Files.readAllBytes(p))
            n.get("name").asText() -> n.get("snapshotId").asLong()
          }
          .toSeq
          .sortBy(_._1)
      finally s.close()
    }

  /** Read the table as of tag `name` — time travel by name. */
  def readTag(spark: SparkSession, root: String, name: String): DataFrame =
    SnapshotStore.readRange(spark, root, 0L, tagId(root, name))

  /** Fork a branch at snapshot `fromId`; returns the branch root (a
    * full snapshot store). Metadata-only: shared-prefix manifests are
    * copied, data dirs are referenced in place.
    */
  def branch(root: String, name: String, fromId: Long): String = {
    require(
      fromId >= 1 && fromId <= SnapshotStore.currentSnapshotId(root),
      s"branch '$name': no snapshot $fromId in $root"
    )
    val bRoot = branchRoot(root, name)
    val bSnap = SnapshotStore.snapDir(bRoot)
    require(!Files.exists(bSnap), s"branch '$name' already exists at $bRoot")
    Files.createDirectories(bSnap)
    (1L to fromId).foreach { id =>
      Files.copy(
        SnapshotStore.snapDir(root).resolve(s"v$id.json"),
        bSnap.resolve(s"v$id.json"),
        StandardCopyOption.COPY_ATTRIBUTES
      )
    }
    val meta: ObjectNode = mapper.createObjectNode()
    meta.put("name", name)
    meta.put("type", "branch")
    meta.put("forkOf", root)
    meta.put("baseId", fromId)
    meta.put("commitMillis", System.currentTimeMillis())
    SnapshotStore.atomicWrite(bSnap.resolve("FORK.json"), mapper.writeValueAsString(meta))
    SnapshotStore.atomicWrite(bSnap.resolve("CURRENT"), fromId.toString)
    bRoot
  }

  /** Fork base of branch `name` (the main snapshot id it diverged at). */
  def branchBase(root: String, name: String): Long =
    mapper
      .readTree(Files.readAllBytes(SnapshotStore.snapDir(branchRoot(root, name)).resolve("FORK.json")))
      .get("baseId")
      .asLong()

  /** `fastForwardedFrom` field of main's manifest `id`, if any. */
  private def ffFrom(root: String, id: Long): Option[String] =
    Option(SnapshotStore.manifest(root, id).get("fastForwardedFrom")).map(_.asText())

  /** Fast-forward main to branch `name`'s head. Requires main's head
    * to still be the fork base (no divergence). Returns the main ids
    * published BY THIS CALL (including any resumed half-commit).
    * Crash-safe in the WAP shape: manifest CAS first (a manifest whose
    * CURRENT never advanced is invisible to readers), then the
    * data-dir move, then CURRENT — and RESUMABLE: on entry, a
    * committed v(head+1).json carrying `fastForwardedFrom == name` is
    * a crashed publish of this same branch, so the call finishes its
    * data-dir move and CURRENT advance (both idempotent) before
    * continuing with the remaining snapshots. Main heads BETWEEN the
    * fork base and the branch head are accepted iff every intervening
    * manifest was fast-forwarded from this branch (an earlier crash
    * mid-multi-snapshot publish); anything else is divergence and
    * fails loudly.
    */
  def fastForward(root: String, name: String): Seq[Long] = {
    val bRoot = branchRoot(root, name)
    val base = branchBase(root, name)
    val bHead = SnapshotStore.currentSnapshotId(bRoot)
    var mHead = SnapshotStore.currentSnapshotId(root)
    require(
      mHead >= base && mHead <= bHead &&
        ((base + 1) to mHead).forall(id => ffFrom(root, id).contains(name)),
      s"fast-forward '$name': main advanced to $mHead since the fork at $base by other writers — " +
        "histories diverged; rebase the branch (re-fork and re-apply) instead"
    )

    // finish one publish (idempotent): data-dir move if still pending,
    // branch-manifest repoint (so the branch stays readable as a pure
    // alias of main), then CURRENT
    def finish(id: Long, bm: ObjectNode): Long = {
      val src = Paths.get(s"$bRoot/data/s$id")
      val dst = Paths.get(s"$root/data/s$id")
      if (Files.exists(src)) Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
      require(
        Files.exists(dst),
        s"fast-forward '$name': snapshot $id's data dir is at neither $src nor $dst"
      )
      SnapshotStore.atomicWrite(
        SnapshotStore.snapDir(bRoot).resolve(s"v$id.json"),
        mapper.writeValueAsString(bm)
      )
      SnapshotStore.atomicWrite(SnapshotStore.snapDir(root).resolve("CURRENT"), id.toString)
      id
    }

    // resume a half-commit: main's next manifest exists but CURRENT
    // never advanced (crash between the CAS and the move/advance)
    val resumed: Seq[Long] = {
      val pendingId = mHead + 1
      val pending = SnapshotStore.snapDir(root).resolve(s"v$pendingId.json")
      if (pendingId <= bHead && Files.exists(pending)) {
        val pm = mapper.readTree(Files.readAllBytes(pending)).deepCopy[ObjectNode]()
        require(
          Option(pm.get("fastForwardedFrom")).exists(_.asText() == name),
          s"fast-forward '$name': found a pending main manifest v$pendingId.json not published by " +
            "this branch — another writer's half-commit; resolve it before publishing"
        )
        finish(pendingId, pm)
        mHead = pendingId
        Seq(pendingId)
      } else Seq.empty
    }

    resumed ++ ((mHead + 1) to bHead).map { id =>
      val bm = SnapshotStore.manifest(bRoot, id).deepCopy[ObjectNode]()
      val finalDir = s"$root/data/s$id"
      val branchDirs = bm.get("dataDirs").elements().asScala.map(_.asText()).toSeq
      require(
        branchDirs == Seq(s"$bRoot/data/s$id"),
        s"fast-forward '$name': snapshot $id has unexpected data dirs $branchDirs"
      )
      val dirs = bm.putArray("dataDirs")
      dirs.add(finalDir)
      bm.put("fastForwardedFrom", name)
      SnapshotStore.atomicWrite(
        SnapshotStore.snapDir(root).resolve(s"v$id.json"),
        mapper.writeValueAsString(bm),
        replace = false
      )
      finish(id, bm)
    }
  }
}
