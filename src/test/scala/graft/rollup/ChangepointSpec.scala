package graft.rollup

import java.sql.Timestamp

import graft.SparkSpec

class ChangepointSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("cusum matches the max(0, s + d) recursion and alarms on sustained drift") {
    // target 10, h 5: values 10,10,12,13,9,16,16
    // d:      0,0,2,3,-1,6,6  -> s: 0,0,2,5,4,10,16
    val df = (1 to 7)
      .zip(Seq(10.0, 10.0, 12.0, 13.0, 9.0, 16.0, 16.0))
      .map { case (i, v) => ("m", ts(i.toLong), i.toLong, v) }
      .toDF("series", "t", "oid", "v")

    val got = Changepoint
      .cusum(df, "series", "t", "oid", "v", targetMicro = 10000000L, hMicro = 5000000L)
      .collect()
      .map(r => (r.getLong(2), r.getLong(4), r.getBoolean(5)))
      .sortBy(_._1)

    val expected = Seq(
      (1L, 0L, false),
      (2L, 0L, false),
      (3L, 2000000L, false),
      (4L, 5000000L, true),
      (5L, 4000000L, false),
      (6L, 10000000L, true),
      (7L, 16000000L, true)
    )
    assert(got.toSeq == expected)
  }

  test("the prefix-min closed form resets after a deep dip (floor moves)") {
    // target 0, values: -5, 3, 4 -> c: -5,-2,2; floor: -5 -> s: 0,3,7
    val df = Seq(
      ("m", ts(1), 1L, -5.0),
      ("m", ts(2), 2L, 3.0),
      ("m", ts(3), 3L, 4.0)
    ).toDF("series", "t", "oid", "v")
    val s = Changepoint
      .cusum(df, "series", "t", "oid", "v", targetMicro = 0L, hMicro = Long.MaxValue)
      .collect()
      .map(r => r.getLong(2) -> r.getLong(4))
      .toMap
    assert(s == Map(1L -> 0L, 2L -> 3000000L, 3L -> 7000000L))
  }
}
