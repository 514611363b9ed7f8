package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming tier must agree with the batch tier on the same rows,
  * and drop rows later than the watermark once the window has closed.
  */
class StreamingRollupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming 1m tier matches the batch rollup on the same input") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Long)]
    val stream = mem.toDF().toDF("series", "ts", "bytes")
    val out = StreamingRollup
      .streamingTier(stream, Seq("series"), "ts", "1m", "10 minutes", col("bytes"))
    val q = out.writeStream.format("memory").queryName("tier1m").outputMode("append").start()

    mem.addData(
      ("a", ts("2024-01-01 00:00:10"), 5L),
      ("a", ts("2024-01-01 00:00:40"), 7L),
      ("a", ts("2024-01-01 00:01:10"), 1L),
      ("b", ts("2024-01-01 00:00:30"), 2L)
    )
    q.processAllAvailable()
    // advance event time far enough to close the first windows
    mem.addData(("a", ts("2024-01-01 01:00:00"), 1L))
    q.processAllAvailable()

    val got = spark
      .table("tier1m")
      .select(col("series"), col("bucket_ts").cast("string"), col("point_count"), col("byte_size"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    q.stop()
    assert(
      got == Set(
        ("a", "2024-01-01 00:00:00", 2L, 12L),
        ("a", "2024-01-01 00:01:00", 1L, 1L),
        ("b", "2024-01-01 00:00:00", 1L, 2L)
      )
    )
  }

  test("custom-state block builder seals hours at the watermark and round-trips exactly") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Long)]
    val points = mem.toDF().toDF("series", "ts", "value").as[StreamPoint]
    val out = StreamingRollup.streamingBlocks(points, watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("blocks").outputMode("append").start()

    mem.addData(
      ("a", ts("2024-01-01 00:10:00"), 5L),
      ("a", ts("2024-01-01 00:20:00"), 7L),
      ("a", ts("2024-01-01 00:15:00"), 6L), // out of order inside the hour
      ("b", ts("2024-01-01 00:30:00"), 2L)
    )
    q.processAllAvailable()
    // nothing sealed yet: watermark still inside hour 0
    assert(spark.table("blocks").count() == 0)

    // event time far past hour 0 + watermark -> both hour-0 groups time out
    mem.addData(("a", ts("2024-01-01 02:00:00"), 1L))
    q.processAllAvailable()
    val got = spark
      .table("blocks")
      .collect()
      .map { r =>
        val tsb = graft.core.DeltaCodec.decode(r.getAs[Array[Byte]]("ts_block"))
        val vb = graft.core.GorillaCodec.decode(r.getAs[Array[Byte]]("val_block"))
        (r.getAs[String]("series"), r.getAs[Timestamp]("hour_start").toString,
         r.getAs[Long]("n_points"), tsb.toSeq, vb.toSeq)
      }
      .toSet
    q.stop()

    def ep(x: String) = ts(x).getTime / 1000
    assert(
      got == Set(
        ("a", "2024-01-01 00:00:00.0", 3L,
          Seq(ep("2024-01-01 00:10:00"), ep("2024-01-01 00:15:00"), ep("2024-01-01 00:20:00")),
          Seq(5.0, 6.0, 7.0)),
        ("b", "2024-01-01 00:00:00.0", 1L, Seq(ep("2024-01-01 00:30:00")), Seq(2.0))
      )
    )
  }

  test("rows later than the watermark are dropped after window close") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Long)]
    val stream = mem.toDF().toDF("series", "ts", "bytes")
    val out = StreamingRollup
      .streamingTier(stream, Seq("series"), "ts", "1m", "5 minutes", col("bytes"))
    val q = out.writeStream.format("memory").queryName("tier1m_late").outputMode("append").start()

    mem.addData(("a", ts("2024-01-01 00:00:10"), 1L))
    q.processAllAvailable()
    mem.addData(("a", ts("2024-01-01 01:00:00"), 1L)) // watermark jumps past 00:00
    q.processAllAvailable()
    mem.addData(("a", ts("2024-01-01 00:00:50"), 100L)) // too late -> dropped
    q.processAllAvailable()
    mem.addData(("a", ts("2024-01-01 02:00:00"), 1L)) // close remaining windows
    q.processAllAvailable()

    val first = spark
      .table("tier1m_late")
      .filter(col("bucket_ts").cast("string") === "2024-01-01 00:00:00")
      .select("point_count", "byte_size")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    q.stop()
    assert(first.toSeq == Seq((1L, 1L)))
  }
}
