package graft.snapshot

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Iceberg-lite snapshot table (SURVEY.md §7): Parquet data files +
  * JSON snapshot manifests, committed atomically via temp-file +
  * rename. Gives snapshot IDs, parent lineage, incremental diffs
  * (which files/partitions a snapshot added) and resumability without
  * the Iceberg runtime (no Iceberg jars exist in /opt/spark/jars).
  *
  * Layout:
  *   root/data/s<id>/...            parquet written by snapshot <id>
  *   root/_snapshots/v<id>.json     manifest {id, parent, dirs, rows}
  *   root/_snapshots/CURRENT        current snapshot id (atomic rename)
  *
  * Scale notes: manifests store directory-level entries (one per
  * snapshot append), not per-row anything; readers prune to the data
  * dirs of the snapshot range they need, so an incremental consumer
  * reads only newly-added files — the continuous-aggregate property.
  */
object SnapshotStore {

  private val mapper = new ObjectMapper()

  private def snapDir(root: String): Path = Paths.get(root, "_snapshots")

  def currentSnapshotId(root: String): Long = {
    val cur = snapDir(root).resolve("CURRENT")
    if (Files.exists(cur)) new String(Files.readAllBytes(cur), StandardCharsets.UTF_8).trim.toLong
    else 0L
  }

  def snapshotIds(root: String): Seq[Long] =
    if (!Files.exists(snapDir(root))) Seq.empty
    else
      Files
        .list(snapDir(root))
        .iterator()
        .asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("v") && s.endsWith(".json") => s.stripPrefix("v").stripSuffix(".json").toLong }
        .toSeq
        .sorted

  private def manifest(root: String, id: Long): JsonNode =
    mapper.readTree(Files.readAllBytes(snapDir(root).resolve(s"v$id.json")))

  /** Atomic write: temp file in the same directory + ATOMIC_MOVE. */
  private def atomicWrite(target: Path, content: String): Unit = {
    Files.createDirectories(target.getParent)
    val tmp = Files.createTempFile(target.getParent, ".tmp", ".json")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Append `df` as a new snapshot; returns the new snapshot id.
    * The data write happens before the manifest commit — a crash
    * between the two leaves an uncommitted orphan dir that readers
    * never see (manifest-driven reads), which is the Iceberg commit
    * protocol in miniature.
    */
  def append(root: String, df: DataFrame): Long = {
    val parent = currentSnapshotId(root)
    val id = parent + 1
    val dataDir = s"$root/data/s$id"
    df.write.mode("errorifexists").parquet(dataDir)
    val rows = df.sparkSession.read.parquet(dataDir).count()

    val m: ObjectNode = mapper.createObjectNode()
    m.put("snapshotId", id)
    m.put("parentId", parent)
    m.put("rows", rows)
    val dirs: ArrayNode = m.putArray("dataDirs")
    dirs.add(dataDir)
    atomicWrite(snapDir(root).resolve(s"v$id.json"), mapper.writeValueAsString(m))
    atomicWrite(snapDir(root).resolve("CURRENT"), id.toString)
    id
  }

  /** Recursive local-FS delete (test/fixture helper — production
    * tables are append-only and never deleted through this).
    */
  def deleteRecursively(root: String): Unit = {
    val p = Paths.get(root)
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
      finally walk.close()
    }
  }

  /** Full-table read at the current snapshot. */
  def read(spark: SparkSession, root: String): DataFrame =
    readRange(spark, root, 0L, currentSnapshotId(root))

  /** Incremental read: rows added by snapshots in (from, to]. */
  def readRange(spark: SparkSession, root: String, fromExclusive: Long, toInclusive: Long): DataFrame = {
    val dirs = snapshotIds(root)
      .filter(id => id > fromExclusive && id <= toInclusive)
      .flatMap(id => manifest(root, id).get("dataDirs").elements().asScala.map(_.asText()).toSeq)
    require(dirs.nonEmpty, s"no data dirs in snapshot range ($fromExclusive, $toInclusive] of $root")
    spark.read.parquet(dirs: _*)
  }
}
