package graft.snapshot

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class ChangelogSpec extends SparkSpec {
  import spark.implicits._

  private def store(): String = {
    val root = Files.createTempDirectory("cdf").toString + "/t"
    SnapshotStore.append(root, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    SnapshotStore.appendDeletes(root, Seq(Tuple1(1L)).toDF("id"))
    SnapshotStore.append(root, Seq((1L, "a2"), (3L, "c")).toDF("id", "v"))
    root
  }

  test("feed labels inserts and key-only delete tombstones, tagged by snapshot") {
    val got = Changelog
      .changes(spark, store(), 0L, 3L)
      .select("_snapshot_id", "_change_type", "id", "v")
      .as[(Long, String, Long, Option[String])]
      .collect()
      .sortBy(r => (r._1, r._3))
      .toSeq
    assert(
      got == Seq(
        (1L, "insert", 1L, Some("a")),
        (1L, "insert", 2L, Some("b")),
        (2L, "delete", 1L, None), // tombstone carries only the key
        (3L, "insert", 1L, Some("a2")),
        (3L, "insert", 3L, Some("c"))
      )
    )
  }

  test("replaying the feed reconstructs the table (snapshot-ordering deletes)") {
    val root = store()
    val feed = Changelog.changes(spark, root, 0L, 3L)
    // replay: a delete erases earlier inserts of its key; later
    // re-inserts survive — emulate with a max-snapshot-wins fold
    val inserts = feed.filter(col("_change_type") === "insert")
    val deletes = feed.filter(col("_change_type") === "delete").select(col("id"), col("_snapshot_id").as("del_at"))
    val replayed = inserts
      .join(deletes, Seq("id"), "left")
      .filter(col("del_at").isNull || col("_snapshot_id") > col("del_at"))
      .select("id", "v")
      .as[(Long, String)]
      .collect()
      .sorted
      .toSeq
    val table = SnapshotStore.read(spark, root).select("id", "v").as[(Long, String)].collect().sorted.toSeq
    assert(replayed == table)
  }

  test("range selects snapshots (from, to]; empty range raises") {
    val root = store()
    val tail = Changelog.changes(spark, root, 2L, 3L)
    assert(tail.select("_snapshot_id").distinct().as[Long].collect().toSeq == Seq(3L))
    intercept[IllegalArgumentException](Changelog.changes(spark, root, 3L, 3L))
  }
}
