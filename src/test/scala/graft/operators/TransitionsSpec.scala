package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TransitionsSpec extends SparkSpec {
  import spark.implicits._

  private def ev = Seq(
    // user 1: a -> b -> a -> c ; user 2: a -> b
    (1L, 1L, 0L, "a"), (2L, 1L, 10L, "b"), (3L, 1L, 20L, "a"), (4L, 1L, 30L, "c"),
    (5L, 2L, 0L, "a"), (6L, 2L, 5L, "b")
  ).toDF("event_id", "user_id", "sec", "state")
    .select(col("event_id"), col("user_id"), timestamp_seconds(col("sec")).as("ts"), col("state"))

  test("counts pair consecutive states per entity; first events pair with nothing") {
    val got = Transitions
      .matrix(ev, Seq("user_id"), "ts", "event_id", "state")
      .as[(String, String, Long, Double)]
      .collect()
      .map(r => (r._1, r._2) -> (r._3, r._4))
      .toMap
    // transitions: a->b (x2), b->a (x1), a->c (x1)
    assert(got(("a", "b")) == ((2L, 2.0 / 3)))
    assert(got(("a", "c")) == ((1L, 1.0 / 3)))
    assert(got(("b", "a")) == ((1L, 1.0)))
    assert(got.size == 3)
  }

  test("probabilities normalize per from_state and sum to 1") {
    val m = Transitions.matrix(ev, Seq("user_id"), "ts", "event_id", "state")
    val sums = m.groupBy("from_state").agg(sum("prob").as("p")).as[(String, Double)].collect().toMap
    assert(sums.values.forall(p => math.abs(p - 1.0) < 1e-12))
  }
}
