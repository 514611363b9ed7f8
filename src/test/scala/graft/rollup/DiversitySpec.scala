package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DiversitySpec extends SparkSpec {
  import spark.implicits._

  test("Simpson index: uniform mix high, monoculture zero, exact rationals") {
    val df = Seq(
      // day 0: 2+2 over two categories -> 1 - 8/16 = 0.5
      ("x", 0L), ("x", 10L), ("y", 20L), ("y", 30L),
      // day 1: one category only -> 1 - 9/9 = 0.0
      ("x", 86400L), ("x", 86410L), ("x", 86420L),
      // day 2: 3+1 skewed -> 1 - 10/16 = 0.375
      ("x", 172800L), ("x", 172810L), ("x", 172820L), ("y", 172830L)
    ).toDF("cat", "sec")
      .select(col("cat"), timestamp_seconds(col("sec")).as("ts"))

    val got = Diversity
      .simpson(df, "ts", "1d", "cat")
      .select(col("bucket_ts").cast("long") / 86400L, col("n_total"), col("sum_sq"), col("simpson"))
      .collect()
      .map(r => r.getDouble(0).toLong -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

    assert(got(0L) == ((4L, 8L, 0.5)))
    assert(got(1L) == ((3L, 9L, 0.0)))
    assert(got(2L) == ((4L, 10L, 0.375)))
  }
}
