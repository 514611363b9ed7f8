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

  test("laggedPearson: a shifted copy correlates perfectly at exactly its shift") {
    // b is a delayed-by-1h copy of a: pairing (x_t, y_{t-k}) aligns at k = -1
    val v = Seq(1.0, 5.0, 2.0, 8.0, 3.0)
    val rows =
      v.zipWithIndex.map { case (x, i) => ("a", i * 3600L, x) } ++
        v.zipWithIndex.map { case (x, i) => ("b", (i + 1) * 3600L, x) }
    val df = rows
      .toDF("series", "sec", "value")
      .select(col("series"), timestamp_seconds(col("sec")).as("ts"), col("value"))
    // minBuckets = 3: a 2-point overlap is always +/-1 by definition
    val got = Correlate
      .laggedPearson(df, "series", "ts", "value", "hour", Seq(-2, -1, 0, 1, 2), minBuckets = 3)
      .collect()
      .map(r => r.getInt(2) -> r)
      .toMap
    assert(math.abs(got(-1).getDouble(4) - 1.0) < 1e-12)
    assert(got(-1).getLong(3) == 5L) // all five buckets align at the true shift
    // misaligned lags overlap on fewer, non-collinear points: the
    // |corr|-argmax must be the true shift, strictly
    for (k <- got.keys if k != -1 && !got(k).isNullAt(4))
      assert(math.abs(got(k).getDouble(4)) < 0.999, s"lag $k")
  }

  test("laggedPearson: lag 0 reproduces pairwisePearson") {
    val df = Seq(
      ("a", 0L, 1.0), ("a", 3600L, 2.0), ("a", 7200L, 5.0), ("a", 10800L, 3.0),
      ("b", 0L, 2.0), ("b", 3600L, 1.0), ("b", 7200L, 9.0), ("b", 10800L, 4.0)
    ).toDF("series", "sec", "value")
      .select(col("series"), timestamp_seconds(col("sec")).as("ts"), col("value"))
    val lag0 = Correlate
      .laggedPearson(df, "series", "ts", "value", "hour", Seq(0))
      .select("type_a", "type_b", "n_buckets", "corr")
      .collect()(0)
    val pair = Correlate.pairwisePearson(df, "series", "ts", "value", "hour").collect()(0)
    assert(lag0.getString(0) == pair.getString(0) && lag0.getString(1) == pair.getString(1))
    assert(lag0.getLong(2) == pair.getLong(2))
    assert(lag0.getDouble(3) == pair.getDouble(3)) // bit-identical, same arithmetic
  }
}
