package graft.snapshot

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Manifest column stats + data-skipping reads: `append(statsCols=...)`
  * records per-snapshot min/max (riding the write's observe — zero
  * extra scan), and `readWhere` prunes snapshots whose range cannot
  * intersect the predicate before any file opens.
  */
class DataSkipSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/tbl"

  private lazy val events =
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select("event_id", "user_id", "ts", "event_type")
      .cache()

  test("readWhere equals the full-scan filter and opens only admitted snapshots' files") {
    val root = tmpDir("skip")
    SnapshotStore.append(root, events.filter(col("user_id") < 5), tsCol = Some("ts"), statsCols = Seq("user_id"))
    SnapshotStore.append(root, events.filter(col("user_id") >= 5 && col("user_id") < 10), tsCol = Some("ts"), statsCols = Seq("user_id"))
    SnapshotStore.append(root, events.filter(col("user_id") >= 10), tsCol = Some("ts"), statsCols = Seq("user_id"))

    assert(SnapshotStore.statsAdmit(root, 2L, "user_id", 6, 8))
    assert(!SnapshotStore.statsAdmit(root, 1L, "user_id", 6, 8))
    assert(!SnapshotStore.statsAdmit(root, 3L, "user_id", 6, 8))

    val got = SnapshotStore.readWhere(spark, root, "user_id", 6, 8)
    val want = events.filter(col("user_id") >= 6 && col("user_id") <= 8)
    assert(got.count() == want.count() && want.count() > 0)
    // the files actually scanned come from snapshot 2 alone
    val files = got.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("/data/s2/")))
    // boundary overlap: [4, 5] needs snapshots 1 AND 2
    val edge = SnapshotStore.readWhere(spark, root, "user_id", 4, 5)
    assert(edge.count() == events.filter(col("user_id") >= 4 && col("user_id") <= 5).count())
    assert(edge.inputFiles.forall(f => f.contains("/data/s1/") || f.contains("/data/s2/")))
  }

  test("snapshots without stats are never skipped; string stats prune lexicographically") {
    val root = tmpDir("skipmix")
    SnapshotStore.append(root, events.filter(col("event_type") === "view"), tsCol = Some("ts")) // no stats
    SnapshotStore.append(root, events.filter(col("event_type") === "purchase"), tsCol = Some("ts"), statsCols = Seq("event_type"))
    val got = SnapshotStore.readWhere(spark, root, "event_type", "view", "view")
    // snapshot 1 (stats-less) must be scanned; snapshot 2's stats
    // ("purchase".."purchase") exclude "view" so it is skipped
    assert(got.count() == events.filter(col("event_type") === "view").count())
    assert(got.inputFiles.forall(_.contains("/data/s1/")))
  }

  test("an all-null stats column skips for range predicates; all-skippable yields an empty typed relation") {
    val root = tmpDir("skipnull")
    val nulls = events.limit(20).withColumn("user_id", lit(null).cast("long"))
    SnapshotStore.append(root, nulls, tsCol = Some("ts"), statsCols = Seq("user_id"))
    assert(!SnapshotStore.statsAdmit(root, 1L, "user_id", 0, Long.MaxValue))
    val got = SnapshotStore.readWhere(spark, root, "user_id", 0, Long.MaxValue)
    assert(got.count() == 0)
    assert(got.columns.toSeq == Seq("event_id", "user_id", "ts", "event_type"))
  }

  test("delete snapshots survive pruning and their anti-join applies to the survivors") {
    val root = tmpDir("skipdel")
    SnapshotStore.append(root, events.filter(col("user_id") < 5), statsCols = Seq("user_id"))
    SnapshotStore.append(root, events.filter(col("user_id") >= 5), statsCols = Seq("user_id"))
    val victim = events.filter(col("user_id") >= 5).select("event_id").limit(3)
    SnapshotStore.appendDeletes(root, victim)
    val got = SnapshotStore.readWhere(spark, root, "user_id", 5, Long.MaxValue)
    assert(got.count() == events.filter(col("user_id") >= 5).count() - 3)
  }

  test("a non-numeric non-string stats column raises loudly") {
    val root = tmpDir("skipbad")
    val e = intercept[IllegalArgumentException](
      SnapshotStore.append(root, events, statsCols = Seq("ts")))
    assert(e.getMessage.contains("must be numeric or string"))
  }
}
