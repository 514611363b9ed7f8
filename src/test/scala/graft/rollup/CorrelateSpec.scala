package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorrelateSpec extends SparkSpec {
  import spark.implicits._

  // three series over four hourly buckets:
  //   a: 1, 2, 3, 4        b: 2, 4, 6, 8  (b = 2a  -> corr +1)
  //   c: 4, 3, 2, 1        (c = 5 - a     -> corr -1 vs both)
  //   d: constant 7        (zero variance -> corr NULL)
  private def series = Seq(
    ("a", 0L, 1.0), ("a", 3600L, 2.0), ("a", 7200L, 3.0), ("a", 10800L, 4.0),
    ("b", 0L, 2.0), ("b", 3600L, 4.0), ("b", 7200L, 6.0), ("b", 10800L, 8.0),
    ("c", 0L, 4.0), ("c", 3600L, 3.0), ("c", 7200L, 2.0), ("c", 10800L, 1.0),
    ("d", 0L, 7.0), ("d", 3600L, 7.0), ("d", 7200L, 7.0), ("d", 10800L, 7.0)
  ).toDF("series", "sec", "value")
    .select(col("series"), timestamp_seconds(col("sec")).as("ts"), col("value"))

  private def run() =
    Correlate
      .pairwisePearson(series, "series", "ts", "value", "hour")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap

  test("perfectly linear pairs hit +/-1, constant series yields NULL") {
    val got = run()
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")))
    assert(math.abs(got(("a", "b")).get - 1.0) < 1e-12)
    assert(math.abs(got(("a", "c")).get + 1.0) < 1e-12)
    assert(math.abs(got(("b", "c")).get + 1.0) < 1e-12)
    assert(got(("a", "d")).isEmpty && got(("b", "d")).isEmpty && got(("c", "d")).isEmpty)
  }

  test("pairs are keyed type_a < type_b and count shared buckets") {
    val rows = Correlate
      .pairwisePearson(series, "series", "ts", "value", "hour")
      .collect()
    assert(rows.forall(r => r.getString(0) < r.getString(1)))
    assert(rows.forall(_.getLong(2) == 4L))
  }

  test("multiple samples per bucket are summed before correlating") {
    // a split into two half-samples per hour must equal the original
    val split = Seq(
      ("a", 0L, 0.5), ("a", 1L, 0.5), ("a", 3600L, 1.0), ("a", 3601L, 1.0),
      ("a", 7200L, 1.5), ("a", 7201L, 1.5), ("a", 10800L, 2.0), ("a", 10801L, 2.0),
      ("b", 0L, 2.0), ("b", 3600L, 4.0), ("b", 7200L, 6.0), ("b", 10800L, 8.0)
    ).toDF("series", "sec", "value")
      .select(col("series"), timestamp_seconds(col("sec")).as("ts"), col("value"))
    val got = Correlate
      .pairwisePearson(split, "series", "ts", "value", "hour")
      .collect()
    assert(got.length == 1)
    assert(math.abs(got(0).getDouble(3) - 1.0) < 1e-12)
  }

  test("minBuckets filters pairs with too little overlap") {
    val sparse = Seq(
      ("a", 0L, 1.0), ("a", 3600L, 2.0),
      ("b", 0L, 5.0) // b shares only one bucket with a
    ).toDF("series", "sec", "value")
      .select(col("series"), timestamp_seconds(col("sec")).as("ts"), col("value"))
    assert(Correlate.pairwisePearson(sparse, "series", "ts", "value", "hour").count() == 0)
  }
}
