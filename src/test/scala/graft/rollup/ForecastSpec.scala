package graft.rollup

import java.sql.Timestamp

import graft.SparkSpec

class ForecastSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("predict_linear recovers an exact line and extrapolates it") {
    // y = 2x + 5 in value units, sampled at 0, 60, 120 seconds
    val base = 1700000000L
    val df = Seq(
      ("cpu", ts(base), 5.0 + 0.0),
      ("cpu", ts(base + 60), 5.0 + 120.0),
      ("cpu", ts(base + 120), 5.0 + 240.0)
    ).toDF("series", "t", "v")

    val row = Forecast.predictLinear(df, "series", "t", "v", horizonSec = 60L).collect().head
    assert(row.getString(0) == "cpu")
    assert(row.getLong(1) == 3L)
    assert(math.abs(row.getDouble(2) - 2.0) < 1e-9)            // slope per second
    assert(math.abs(row.getDouble(3) - (5.0 + 2.0 * 180)) < 1e-6) // value at base+180
  }

  test("constant-x series yields NULL fit; minPoints filters singletons") {
    val df = Seq(
      ("flat", ts(100L), 1.0),
      ("flat", ts(100L), 3.0), // same timestamp: den = 0
      ("lone", ts(100L), 1.0)
    ).toDF("series", "t", "v")
    val out = Forecast.predictLinear(df, "series", "t", "v", horizonSec = 10L).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "flat" && r.isNullAt(2) && r.isNullAt(3))
  }

  test("negative slope forecast") {
    val df = Seq(
      ("disk", ts(0L), 100.0),
      ("disk", ts(10L), 90.0),
      ("disk", ts(20L), 80.0)
    ).toDF("series", "t", "v")
    val r = Forecast.predictLinear(df, "series", "t", "v", horizonSec = 30L).collect().head
    assert(math.abs(r.getDouble(2) + 1.0) < 1e-9)
    assert(math.abs(r.getDouble(3) - 50.0) < 1e-6) // line 100 - t, evaluated at t = 20 + 30
  }
}
