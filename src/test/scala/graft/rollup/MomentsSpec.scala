package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MomentsSpec extends SparkSpec {
  import spark.implicits._

  test("co-moment variance: hand-computed goldens, exact sums") {
    val df = Seq(
      // day 0, series a: 1,2,3,4 -> var_pop = (4*30 - 100)/16 = 1.25
      ("a", 0L, 1.0), ("a", 10L, 2.0), ("a", 20L, 3.0), ("a", 30L, 4.0),
      // day 0, series b: constant -> var 0
      ("b", 0L, 7.5), ("b", 10L, 7.5),
      // day 1, series a: singleton -> var 0
      ("a", 86400L, 9.0)
    ).toDF("series", "sec", "value")
      .select(col("series"), timestamp_seconds(col("sec")).as("ts"), col("value"))

    val got = Moments
      .bucketVariance(df, Seq("series"), "ts", "1d", "value")
      .select(col("series"), col("bucket_ts").cast("long"), col("n"), col("sx"), col("sxx"), col("var_pop"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap

    assert(got(("a", 0L)) == ((4L, 10.0, 30.0, 1.25)))
    assert(got(("b", 0L)) == ((2L, 15.0, 112.5, 0.0)))
    assert(got(("a", 86400L)) == ((1L, 9.0, 81.0, 0.0)))
  }
}
