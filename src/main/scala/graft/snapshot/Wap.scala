package graft.snapshot

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Write-Audit-Publish (WAP) branches over the snapshot store — the
  * Iceberg staging pattern (branch write + audit + fast-forward
  * publish): a producer writes a batch to a BRANCH nobody reads by
  * default, audits the branch view (main ∪ staged), and only then
  * publishes, atomically promoting the staged snapshots into the main
  * history. Bad data never becomes visible to consumers, and the
  * audit runs against real committed files, not a pre-write sample.
  *
  * Layout (all under the table root):
  *   root/_wap/<branch>/k<k>/...              staged parquet (k = stage index)
  *   root/_snapshots/wap_<branch>_k<k>.json   staged manifest {branch, stage,
  *                                            baseId, rows, schemaJson, dataDirs, tsCol}
  *
  * Staged data lives OUTSIDE root/data, so `SnapshotStore.vacuum`
  * can never mistake an unpublished branch for a crashed append.
  *
  * Publish is per-stage: (1) CAS the main manifest for the next id
  * (pointing at data/s<id>), (2) atomically move the staged dir
  * there, (3) drop the stage manifest, (4) advance CURRENT. The CAS
  * carries (branch, stage) tags, so a crashed publish RESUMES: a
  * retry that finds its own tags on the already-committed manifest
  * continues from the move instead of raising — publish is
  * idempotent. A manifest committed without CURRENT advancing is
  * invisible to readers (reads stop at CURRENT), so every crash
  * window is consistent.
  *
  * Publishing requires main's CURRENT to still equal the branch's
  * recorded base: if main advanced since staging, the branch is
  * STALE and publish raises (the Iceberg fast-forward precondition) —
  * re-stage against the new base rather than silently interleaving
  * histories.
  */
object Wap {

  private val mapper = new ObjectMapper()

  private def stageManifestPath(root: String, branch: String, k: Int) =
    SnapshotStore.snapDir(root).resolve(s"wap_${branch}_k$k.json")

  private def stageDataDir(root: String, branch: String, k: Int): String =
    s"$root/_wap/$branch/k$k"

  /** Stage indices of `branch`, in order. */
  def stages(root: String, branch: String): Seq[Int] = {
    val dir = SnapshotStore.snapDir(root)
    if (!Files.exists(dir)) return Seq.empty
    val s = Files.list(dir)
    val prefix = s"wap_${branch}_k"
    try
      s.iterator()
        .asScala
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith(prefix) && n.endsWith(".json") => n.stripPrefix(prefix).stripSuffix(".json").toInt }
        .toSeq
        .sorted
    finally s.close()
  }

  private def stageManifest(root: String, branch: String, k: Int) =
    mapper.readTree(Files.readAllBytes(stageManifestPath(root, branch, k)))

  /** Stage `df` on `branch`. The first stage pins the branch BASE
    * (main's CURRENT right now); later stages join the same base.
    * Returns the stage index. One writer per branch (branches are a
    * producer's private staging area; concurrency belongs to the
    * publish CAS, not here).
    */
  def stage(root: String, df: DataFrame, branch: String, tsCol: Option[String] = None): Int = {
    require(branch.matches("[A-Za-z0-9_-]+"), s"branch name '$branch' must be [A-Za-z0-9_-]+")
    val existing = stages(root, branch)
    val k = existing.lastOption.map(_ + 1).getOrElse(0)
    val baseId =
      existing.headOption
        .map(first => stageManifest(root, branch, first).get("baseId").asLong())
        .getOrElse(SnapshotStore.currentSnapshotId(root))
    val dataDir = stageDataDir(root, branch, k)
    val obs = Observation(s"graft_wap_${branch}_$k")
    tsCol match {
      case Some(ts) =>
        df.withColumn("part_day", to_date(col(ts)))
          .repartitionByRange(col("part_day"), col(ts))
          .observe(obs, count(lit(1)).as("rows"))
          .write
          .mode("errorifexists")
          .partitionBy("part_day")
          .parquet(dataDir)
      case None =>
        df.observe(obs, count(lit(1)).as("rows")).write.mode("errorifexists").parquet(dataDir)
    }
    val rows = obs.get("rows").asInstanceOf[Long]
    val m: ObjectNode = mapper.createObjectNode()
    m.put("branch", branch)
    m.put("stage", k)
    m.put("baseId", baseId)
    m.put("rows", rows)
    m.put("schemaJson", df.schema.json)
    val dirs: ArrayNode = m.putArray("dataDirs")
    dirs.add(dataDir)
    tsCol.foreach(ts => m.put("tsCol", ts))
    SnapshotStore.atomicWrite(stageManifestPath(root, branch, k), mapper.writeValueAsString(m))
    k
  }

  /** The AUDIT view: main at CURRENT ∪ everything staged on `branch`.
    * This is what quality gates run against before publish — the same
    * bytes that will become visible, read through the same scan.
    */
  def auditRead(spark: SparkSession, root: String, branch: String): DataFrame = {
    val ks = stages(root, branch)
    require(ks.nonEmpty, s"branch '$branch' has nothing staged in $root")
    val staged = ks.map { k =>
      val m = stageManifest(root, branch, k)
      val schema = org.apache.spark.sql.types.DataType
        .fromJson(m.get("schemaJson").asText())
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      val dirs = m.get("dataDirs").elements().asScala.map(_.asText()).toSeq
      // leaf-dir expansion, like readRange: `part_day=` is a path
      // token, never a data column — reading the root would let
      // partition discovery invent a column main doesn't have
      val leaves =
        if (m.has("tsCol"))
          for (d <- dirs; day <- SnapshotStore.listDayTokens(d)) yield s"$d/part_day=$day"
        else dirs
      spark.read.schema(schema).parquet(leaves: _*)
    }
    val main =
      if (SnapshotStore.currentSnapshotId(root) == 0L) None
      else Some(SnapshotStore.read(spark, root))
    (main.toSeq ++ staged).reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Drop a branch without publishing (the audit failed): staged data
    * and manifests are removed, main never saw a byte.
    */
  def discard(root: String, branch: String): Unit = {
    stages(root, branch).foreach(k => Files.deleteIfExists(stageManifestPath(root, branch, k)))
    SnapshotStore.deleteRecursively(s"$root/_wap/$branch")
  }

  /** Publish `branch` onto main: every staged snapshot becomes a real
    * main snapshot, in stage order. Returns the assigned main ids.
    * Raises when the branch is STALE (main advanced past the branch
    * base) or when a foreign writer wins the id CAS; resumes cleanly
    * when the previous publish of this very branch crashed mid-way.
    */
  def publish(root: String, branch: String): Seq[Long] = {
    // RESUME a crashed publish of this very branch first: a committed
    // manifest whose CURRENT never advanced is invisible to readers
    // but owns the next id — finish its move/cleanup/advance steps
    // before (or instead of) publishing the remaining stages.
    val resumed = scala.collection.mutable.ArrayBuffer.empty[Long]
    var resuming = true
    while (resuming) {
      val cur = SnapshotStore.currentSnapshotId(root)
      val next = SnapshotStore.snapDir(root).resolve(s"v${cur + 1}.json")
      resuming = Files.exists(next) && {
        val em = mapper.readTree(Files.readAllBytes(next))
        Option(em.get("wapBranch")).exists(_.asText() == branch) && {
          finishStage(root, branch, em.get("wapStage").asInt(), cur + 1)
          resumed += cur + 1
          true
        }
      }
    }

    val ks = stages(root, branch)
    if (ks.isEmpty && resumed.nonEmpty) return resumed.toSeq
    require(ks.nonEmpty, s"branch '$branch' has nothing staged in $root")
    val base = stageManifest(root, branch, ks.head).get("baseId").asLong()
    val current = SnapshotStore.currentSnapshotId(root)
    require(
      current == base || resumed.nonEmpty,
      s"branch '$branch' is stale: staged on base $base but main is at $current — " +
        "main advanced since staging; re-stage the branch against the new base (or discard)"
    )
    resumed.toSeq ++ ks.map { k =>
      val sm = stageManifest(root, branch, k)
      val id = SnapshotStore.currentSnapshotId(root) + 1
      val finalDir = s"$root/data/s$id"
      val stagedDir = stageDataDir(root, branch, k)

      val m: ObjectNode = mapper.createObjectNode()
      m.put("snapshotId", id)
      m.put("parentId", id - 1)
      m.put("rows", sm.get("rows").asLong())
      m.put("schemaJson", sm.get("schemaJson").asText())
      m.put("commitMillis", System.currentTimeMillis())
      m.put("wapBranch", branch)
      m.put("wapStage", k)
      val dirs: ArrayNode = m.putArray("dataDirs")
      dirs.add(finalDir)
      Option(sm.get("tsCol")).foreach { ts =>
        m.put("tsCol", ts.asText())
        val days: ArrayNode = m.putArray("days")
        SnapshotStore.listDayTokens(stagedDir).foreach(days.add)
      }
      // a CAS loss here is always a FOREIGN writer (our own crashed
      // commits were consumed by the resume loop above) — raise, the
      // branch base is gone
      SnapshotStore.atomicWrite(
        SnapshotStore.snapDir(root).resolve(s"v$id.json"),
        mapper.writeValueAsString(m),
        replace = false)
      finishStage(root, branch, k, id)
      id
    }
  }

  /** Post-CAS steps of one stage publish, safe to re-run: move the
    * staged dir to its final home (skipped if a crashed run already
    * did), drop the stage manifest, advance CURRENT.
    */
  private def finishStage(root: String, branch: String, k: Int, id: Long): Unit = {
    val stagedDir = Paths.get(stageDataDir(root, branch, k))
    if (Files.exists(stagedDir))
      Files.move(stagedDir, Paths.get(s"$root/data/s$id"), StandardCopyOption.ATOMIC_MOVE)
    Files.deleteIfExists(stageManifestPath(root, branch, k))
    SnapshotStore.atomicWrite(SnapshotStore.snapDir(root).resolve("CURRENT"), id.toString)
    // the branch dir is scaffolding: drop it once its last stage moved
    // out (delete fails harmlessly while sibling stages remain)
    try {
      Files.deleteIfExists(Paths.get(root, "_wap", branch))
      Files.deleteIfExists(Paths.get(root, "_wap"))
    } catch { case _: java.nio.file.DirectoryNotEmptyException => () }
  }
}
