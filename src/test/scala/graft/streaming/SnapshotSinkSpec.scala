package graft.streaming

import graft.SparkSpec
import graft.snapshot.SnapshotStore
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming → snapshot-store sink: exactly-once under crash-retry
  * re-delivery, and the as-of-timestamp time travel the recorded
  * commit stamps enable.
  */
class SnapshotSinkSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private lazy val events =
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select("event_id", "user_id", "ts", "event_type")
      .cache()

  test("foreachBatch sink commits each micro-batch once; re-delivery is a no-op") {
    val root = tmpDir("sink") + "/tbl"
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", 4)
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[(Long, Long, java.sql.Timestamp, String)]
    val stream = ms.toDF().toDF("event_id", "user_id", "ts", "event_type")
    val q = stream.writeStream
      .option("checkpointLocation", tmpDir("sinkchk"))
      .foreachBatch { (b: DataFrame, id: Long) =>
        SnapshotSink.appendBatch(root, b, id, tsCol = Some("ts")); ()
      }
      .start()
    val rows = events.as[(Long, Long, java.sql.Timestamp, String)].collect().toSeq
    val (half1, half2) = rows.splitAt(rows.size / 2)
    ms.addData(half1)
    q.processAllAvailable()
    ms.addData(half2)
    q.processAllAvailable()
    q.stop()

    val hwm = SnapshotStore.lastStreamBatchId(root)
    assert(hwm >= 1L, "two micro-batches should have committed")
    val before = SnapshotStore.read(s, root).count()
    assert(before == rows.size)

    // crash-retry: Structured Streaming re-delivers the SAME batch id
    // with the same data when the checkpoint commit was lost — the
    // high-water mark in the manifest makes the retry a no-op. (Cast ts
    // to the streamed encoder's LTZ type: the table's schema guard is
    // ADD-only and the parquet fixture reads back NTZ.)
    val asStreamed = events.withColumn("ts", col("ts").cast("timestamp"))
    val redelivered = SnapshotSink.appendBatch(root, asStreamed, hwm, tsCol = Some("ts"))
    assert(redelivered.isEmpty)
    assert(SnapshotStore.read(s, root).count() == before)
    assert(SnapshotStore.lastStreamBatchId(root) == hwm)

    // the NEXT batch id still commits
    val next = SnapshotSink.appendBatch(root, asStreamed.limit(5), hwm + 1, tsCol = Some("ts"))
    assert(next.nonEmpty)
    assert(SnapshotStore.read(s, root).count() == before + 5)
  }

  test("a fresh table has stream high-water mark -1; batch appends never advance it") {
    val root = tmpDir("sinkhwm") + "/tbl"
    assert(SnapshotStore.lastStreamBatchId(root) == -1L)
    SnapshotStore.append(root, events.limit(10), tsCol = Some("ts"))
    assert(SnapshotStore.lastStreamBatchId(root) == -1L)
  }

  test("as-of-timestamp reads resolve to the newest snapshot at or before the stamp") {
    val root = tmpDir("asof") + "/tbl"
    val evens = events.filter(pmod(col("event_id"), lit(2)) === 0)
    val odds = events.filter(pmod(col("event_id"), lit(2)) === 1)
    val before = System.currentTimeMillis() - 1
    SnapshotStore.append(root, evens, tsCol = Some("ts"))
    val t1 = SnapshotStore.commitMillis(root, 1L).get
    // guarantee commit2 lands on a LATER millisecond than commit1
    while (System.currentTimeMillis() <= t1) Thread.sleep(1)
    SnapshotStore.append(root, odds, tsCol = Some("ts"))
    val t2 = SnapshotStore.commitMillis(root, 2L).get
    assert(t2 > t1)

    assert(SnapshotStore.snapshotAsOf(root, before) == 0L, "predates the table")
    assert(SnapshotStore.snapshotAsOf(root, t1) == 1L)
    assert(SnapshotStore.snapshotAsOf(root, t2 - 1) == 1L)
    assert(SnapshotStore.snapshotAsOf(root, t2) == 2L)
    assert(SnapshotStore.snapshotAsOf(root, System.currentTimeMillis()) == 2L)

    assert(SnapshotStore.readAsOf(spark, root, t1).count() == evens.count())
    assert(SnapshotStore.readAsOf(spark, root, t2).count() == events.count())
  }

  test("compaction keeps the rebase point's commit stamp so as-of reads at it still resolve") {
    val root = tmpDir("asofcomp") + "/tbl"
    SnapshotStore.append(root, events.limit(50), tsCol = Some("ts"))
    val t1 = SnapshotStore.commitMillis(root, 1L).get
    while (System.currentTimeMillis() <= t1) Thread.sleep(1)
    SnapshotStore.append(root, events.limit(80).except(events.limit(50)), tsCol = Some("ts"))
    val t2 = SnapshotStore.commitMillis(root, 2L).get
    val n = SnapshotStore.read(spark, root).count()
    SnapshotStore.compact(spark, root, upTo = 2L)
    assert(SnapshotStore.commitMillis(root, 2L).contains(t2))
    assert(SnapshotStore.snapshotAsOf(root, t2) == 2L)
    assert(SnapshotStore.readAsOf(spark, root, t2).count() == n)
  }
}
