package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  private def mk(rows: Seq[(Long, String, Long, Double)]) =
    rows
      .toDF("event_id", "series", "sec", "value")
      .select(col("event_id"), col("series"), timestamp_seconds(col("sec")).as("ts"), col("value"))

  test("z-score against the previous-window moments; warm-up and constant history give null") {
    // history 2,4,2,4 (mean 3, var 1) then a 9: z = (9-3)/1 = 6
    val df = mk(Seq((1L, "a", 0L, 2.0), (2L, "a", 1L, 4.0), (3L, "a", 2L, 2.0), (4L, "a", 3L, 4.0), (5L, "a", 4L, 9.0)))
    val got = Anomaly
      .rollingZ(df, Seq("series"), "ts", "value", "event_id", lookback = 4, minPoints = 4, threshold = 3.0)
      .select("event_id", "z", "is_anomaly")
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)).map(_.asInstanceOf[Double]), Option(r.get(2)).map(_.asInstanceOf[Boolean]))))
      .toMap
    assert(got(1L) == ((None, None)))
    assert(got(4L) == ((None, None))) // only 3 prior points < minPoints
    assert(got(5L)._1.contains(6.0))
    assert(got(5L)._2.contains(true))
  }

  test("constant history: variance 0 -> null score, never a divide-by-zero") {
    val df = mk(Seq((1L, "a", 0L, 5.0), (2L, "a", 1L, 5.0), (3L, "a", 2L, 5.0), (4L, "a", 3L, 7.0)))
    val got = Anomaly
      .rollingZ(df, Seq("series"), "ts", "value", "event_id", lookback = 3, minPoints = 2, threshold = 3.0)
      .filter(col("event_id") === 4)
      .select("z")
      .collect()(0)
    assert(got.isNullAt(0))
  }

  test("lookback bounds the window: old points age out") {
    // lookback 2: point 4 scored against {10, 10} not {0, 10, 10}
    val df = mk(Seq((1L, "a", 0L, 0.0), (2L, "a", 1L, 10.0), (3L, "a", 2L, 10.0), (4L, "a", 3L, 10.0)))
    val got = Anomaly
      .rollingZ(df, Seq("series"), "ts", "value", "event_id", lookback = 2, minPoints = 2, threshold = 1.0)
      .filter(col("event_id") === 4)
      .select("z")
      .collect()(0)
    assert(got.isNullAt(0)) // {10,10} has variance 0
  }

  test("plan: one exchange on the series key") {
    val df = mk(Seq((1L, "a", 0L, 1.0), (2L, "a", 1L, 2.0)))
    val plan = Anomaly
      .rollingZ(df, Seq("series"), "ts", "value", "event_id", lookback = 4, minPoints = 2, threshold = 3.0)
      .queryExecution
      .executedPlan
      .toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }
}
