package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HistogramSpec extends SparkSpec {
  import spark.implicits._

  private def values = Seq(
    ("a", 0.0), ("a", 4.9), ("a", 5.0), ("a", 12.0), ("a", -0.1),
    ("b", 7.5)
  ).toDF("series", "value")

  test("fixedWidth bins on floor(value/width) with half-open [lo, hi) edges") {
    val got = Histogram
      .fixedWidth(values, "series", "value", 5.0)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got == Map(
      ("a", -1L) -> ((-5.0, 0.0, 1L, 1L)),  // -0.1 falls below zero
      ("a", 0L) -> ((0.0, 5.0, 2L, 3L)),    // 0.0 and 4.9; 5.0 is the NEXT bin
      ("a", 1L) -> ((5.0, 10.0, 1L, 4L)),
      ("a", 2L) -> ((10.0, 15.0, 1L, 5L)),
      ("b", 1L) -> ((5.0, 10.0, 1L, 1L))
    ))
  }

  test("cum_n is per-series and reaches the series total in the top bin") {
    val rows = Histogram.fixedWidth(values, "series", "value", 5.0)
    val tops = rows
      .groupBy("series")
      .agg(max("cum_n").as("top"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(tops == Map("a" -> 5L, "b" -> 1L))
  }

  test("zero or negative width is rejected") {
    intercept[IllegalArgumentException] {
      Histogram.fixedWidth(values, "series", "value", 0.0)
    }
  }

  test("histogramQuantile: rank interpolation inside the first covering bin") {
    val ten = (1 to 10).map(i => ("a", i.toDouble)).toDF("series", "value")
    def est(q: Double) = Histogram
      .histogramQuantile(ten, "series", "value", width = 2.0, q = q)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // q=0.5: target 5 -> bin 2 (cum 5, prev 3): 4 + 2*(5-3)/2 = 6
    assert(est(0.5).toSeq == Seq(("a", 10L, 2L, 6.0)))
    // q=0.9: target 9 -> bin 4 (cum 9, prev 7): 8 + 2*(9-7)/2 = 10
    assert(est(0.9).toSeq == Seq(("a", 10L, 4L, 10.0)))
    // q=1.0: target 10 -> top bin 5 (cum 10, prev 9): 10 + 2*(10-9)/1 = 12
    assert(est(1.0).toSeq == Seq(("a", 10L, 5L, 12.0)))
  }

  test("histogramQuantile rejects out-of-range quantiles") {
    intercept[IllegalArgumentException] {
      Histogram.histogramQuantile(values, "series", "value", 5.0, q = 0.0)
    }
  }

  test("logBuckets: bit-length bucketing, exact shift bounds, underflow bucket") {
    val df = Seq(
      ("a", 1.0),      // micro 1_000_000, bin length 20 -> [2^19, 2^20)
      ("a", 1.04),     // micro 1_040_000, still length 20
      ("a", 2.0),      // micro 2_000_000, length 21
      ("a", 0.000001), // micro 1, length 1 -> [1, 2)
      ("a", 0.0),      // micro 0 -> underflow bucket 0
      ("b", -3.0)      // negative -> underflow bucket 0
    ).toDF("series", "value")
    val got = Histogram
      .logBuckets(df, "series", "value")
      .collect()
      .map { r =>
        val lo = if (r.isNullAt(2)) None else Some(r.getLong(2))
        (r.getString(0), r.getLong(1)) -> ((lo, r.getLong(3), r.getLong(4)))
      }
      .toMap
    assert(got(("a", 20L)) == ((Some(1L << 19), 1L << 20, 2L)))
    assert(got(("a", 21L)) == ((Some(1L << 20), 1L << 21, 1L)))
    assert(got(("a", 1L)) == ((Some(1L), 2L, 1L)))
    assert(got(("a", 0L)) == ((None, 0L, 1L)))
    assert(got(("b", 0L)) == ((None, 0L, 1L)))
  }
}
