package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DoubleSmoothSpec extends SparkSpec {
  import spark.implicits._

  private def series = Seq(
    (1L, "a", 0L, 4.0),
    (2L, "a", 10L, 8.0),
    (3L, "a", 20L, 2.0),
    (4L, "a", 30L, 6.0),
    (5L, "b", 0L, 10.0)
  ).toDF("event_id", "series", "sec", "value")
    .select(col("event_id"), col("series"), timestamp_seconds(col("sec")).as("ts"), col("value"))

  private def run(lookback: Int) =
    DoubleSmooth
      .holt(series, Seq("series"), "ts", "value", "event_id", lookback)
      .select("event_id", "level", "trend", "forecast", "n_window")
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap

  test("Holt recursion at alpha=beta=1/2 is exact (hand-computed goldens)") {
    val got = run(lookback = 3)
    // id=1: init only: l = x, b = 0
    assert(got(1L) == ((4.0, 0.0, 4.0, 1L)))
    // id=2: window [4,8]: l=(8+4+0)/2=6, b=(8-4+0)/4=1, forecast=7
    assert(got(2L) == ((6.0, 1.0, 7.0, 2L)))
    // id=3: window [4,8,2]: then l=(2+6+1)/2=4.5, b=(2-6+3)/4=-0.25
    assert(got(3L) == ((4.5, -0.25, 4.25, 3L)))
    // id=4: window [8,2,6]: l0=8; l1=5, b1=-1.5; l2=(6+5-1.5)/2=4.75,
    //       b2=(6-5-4.5)/4=-0.875, forecast=3.875
    assert(got(4L) == ((4.75, -0.875, 3.875, 3L)))
    // series b: independent partition
    assert(got(5L) == ((10.0, 0.0, 10.0, 1L)))
  }

  test("lookback=1 degenerates to level=value, trend=0") {
    val got = run(lookback = 1)
    assert(got(3L) == ((2.0, 0.0, 2.0, 1L)))
    assert(got(4L) == ((6.0, 0.0, 6.0, 1L)))
  }

  test("a steadily climbing series carries positive trend and forecasts ahead of level") {
    val climb = Seq.tabulate(8)(i => (i.toLong, "c", i.toLong * 10, i.toDouble))
      .toDF("event_id", "series", "sec", "value")
      .select(col("event_id"), col("series"), timestamp_seconds(col("sec")).as("ts"), col("value"))
    val last = DoubleSmooth
      .holt(climb, Seq("series"), "ts", "value", "event_id", lookback = 8)
      .filter(col("event_id") === 7L)
      .select("level", "trend", "forecast")
      .collect()
      .head
    assert(last.getDouble(1) > 0.5) // trend tracks the +1/step climb
    assert(last.getDouble(2) > last.getDouble(0)) // forecast = level + trend
  }

  test("bad lookback is rejected") {
    intercept[IllegalArgumentException] {
      DoubleSmooth.holt(series, Seq("series"), "ts", "value", "event_id", 0)
    }
    intercept[IllegalArgumentException] {
      DoubleSmooth.holt(series, Seq("series"), "ts", "value", "event_id", 17)
    }
  }
}
