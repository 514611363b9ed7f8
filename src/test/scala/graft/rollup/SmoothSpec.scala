package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SmoothSpec extends SparkSpec {
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
    Smooth
      .ewma(series, Seq("series"), "ts", "value", "event_id", lookback)
      .select("event_id", "ewma", "n_window")
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2))))
      .toMap

  test("alpha=0.5 Horner fold: newest weighs 1, halving backwards, normalized") {
    val got = run(lookback = 3)
    // id=1: single sample -> itself
    assert(got(1L) == ((4.0, 1L)))
    // id=2: (0.5*4 + 1*8) / 1.5 = 10/1.5
    assert(math.abs(got(2L)._1 - 10.0 / 1.5) < 1e-15 && got(2L)._2 == 2L)
    // id=3: (0.25*4 + 0.5*8 + 1*2) / 1.75 = 7/1.75 = 4.0
    assert(got(3L) == ((4.0, 3L)))
    // id=4: window drops the first sample: (0.25*8 + 0.5*2 + 1*6) / 1.75 = 9/1.75
    assert(math.abs(got(4L)._1 - 9.0 / 1.75) < 1e-15 && got(4L)._2 == 3L)
    // series b: independent partition
    assert(got(5L) == ((10.0, 1L)))
  }

  test("lookback=1 degenerates to the identity") {
    val got = run(lookback = 1)
    assert(got(3L) == ((2.0, 1L)) && got(4L) == ((6.0, 1L)))
  }

  test("bad parameters are rejected") {
    intercept[IllegalArgumentException] {
      Smooth.ewma(series, Seq("series"), "ts", "value", "event_id", 0)
    }
    intercept[IllegalArgumentException] {
      Smooth.ewma(series, Seq("series"), "ts", "value", "event_id", 3, alpha = 0.0)
    }
  }
}
