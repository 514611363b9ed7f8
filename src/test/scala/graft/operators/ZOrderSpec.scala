package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: a at even positions, b at odd") {
    val got = Seq((5L, 3L), (0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L))
      .toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect()
      .map(_.getLong(0))
    // a=0b101 -> bits 0,4; b=0b011 -> bits 1,3: 1+2+8+16 = 27
    assert(got(0) == 27L)
    assert(got(1) == 0L)
    // all-a: even bits of a 32-bit word; all-b: odd bits; both: all ones
    assert(got(2) == 0x55555555L)
    assert(got(3) == 0xAAAAAAAAL)
    assert(got(4) == 0xFFFFFFFFL)
  }

  test("hash16 stays in [0, 65535] and matches the portable recipe") {
    val vals = spark
      .range(1000)
      .select(ZOrder.hash16(col("id"), "s").as("h"))
      .collect()
      .map(_.getLong(0))
    assert(vals.forall(h => h >= 0 && h <= 65535))
    assert(vals.distinct.length > 900) // ~uniform over 2^16
  }

  test("z-ordered range layout bounds both dimensions per partition; a single-dim sort does not") {
    // a 64x64 grid of RAW dimension values, z-interleaved directly
    val grid = spark
      .range(4096)
      .select((col("id") / 64).cast("long").as("x"), pmod(col("id"), lit(64)).as("y"))
    val nParts = 16

    def maxSpanOfY(df: org.apache.spark.sql.DataFrame): Long =
      df.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg((max("y") - min("y")).as("span"))
        .agg(max("span"))
        .collect()(0)
        .getLong(0)

    val zLaid = grid
      .withColumn("z", ZOrder.zValue(col("x"), col("y")))
      .repartitionByRange(nParts, col("z"))
    val xLaid = grid.repartitionByRange(nParts, col("x"))

    // x-sorted partitions see the full y range (span 63); z-ordered
    // partitions cover a bounded y window (a ~256-code z interval
    // touches 2-3 aligned 16x16 tiles, sampling slop included), so y
    // predicates prune files
    assert(maxSpanOfY(xLaid) == 63L)
    assert(maxSpanOfY(zLaid) <= 47L)
  }

  test("layout rejects a non-positive partition count") {
    val df = Seq((1L, "a")).toDF("id", "k")
    intercept[IllegalArgumentException] {
      ZOrder.layout(df, "id", "k", 0)
    }
  }
}
