package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lhs = Seq(
    (1L, "a", 100L),
    (2L, "a", 205L),
    (3L, "a", 300L),
    (4L, "b", 100L),
    (5L, "c", 50L)
  ).toDF("id", "k", "sec")
    .select(col("id"), col("k"), timestamp_seconds(col("sec")).as("ts"))

  private def rhs = Seq(
    ("a", 90L, 1.0),
    ("a", 205L, 2.0), // exact tie with left id=2
    ("a", 290L, 3.0),
    ("b", 400L, 4.0) // only AFTER b's left row
  ).toDF("k", "rsec", "rv")
    .select(col("k"), timestamp_seconds(col("rsec")).as("rts"), col("rv"))

  private def collectMap(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "rv").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

  test("backward: nearest prior-or-equal right row per key, left-outer") {
    val got = collectMap(AsofJoin.asof(lhs, rhs, Seq("k"), "ts", "rts"))
    assert(got(1L) == Some(1.0)) // 90 <= 100
    assert(got(2L) == Some(2.0)) // exact timestamp tie matches
    assert(got(3L) == Some(3.0)) // 290, not 205
    assert(got(4L) == None) // b's only right row is in the future
    assert(got(5L) == None) // key with no right rows at all
  }

  test("forward: nearest at-or-after right row per key") {
    val got = collectMap(AsofJoin.asof(lhs, rhs, Seq("k"), "ts", "rts", direction = "forward"))
    assert(got(1L) == Some(2.0)) // 205 is the nearest >= 100
    assert(got(2L) == Some(2.0)) // tie matches
    assert(got(3L) == None) // nothing at or after 300 for a
    assert(got(4L) == Some(4.0))
  }

  test("tolerance nulls out matches farther than the bound") {
    val got = collectMap(
      AsofJoin.asof(lhs, rhs, Seq("k"), "ts", "rts", toleranceMicros = Some(10L * 1000000))
    )
    assert(got(1L) == Some(1.0)) // 10 s away: within
    assert(got(2L) == Some(2.0)) // 0 s away
    assert(got(3L) == Some(3.0)) // 10 s away: within
    val tight = collectMap(
      AsofJoin.asof(lhs, rhs, Seq("k"), "ts", "rts", toleranceMicros = Some(5L * 1000000))
    )
    assert(tight(1L) == None && tight(3L) == None && tight(2L) == Some(2.0))
  }

  test("duplicate right timestamps resolve to the struct-largest row, both directions") {
    val dup = Seq(("a", 90L, 1.0), ("a", 90L, 9.0))
      .toDF("k", "rsec", "rv")
      .select(col("k"), timestamp_seconds(col("rsec")).as("rts"), col("rv"))
    assert(collectMap(AsofJoin.asof(lhs, dup, Seq("k"), "ts", "rts"))(1L) == Some(9.0))
    val early = Seq((6L, "a", 50L))
      .toDF("id", "k", "sec")
      .select(col("id"), col("k"), timestamp_seconds(col("sec")).as("ts"))
    assert(
      collectMap(AsofJoin.asof(early, dup, Seq("k"), "ts", "rts", direction = "forward"))(
        6L
      ) == Some(9.0)
    )
  }

  test("null left timestamp gets no match in either direction") {
    val l = Seq((1L, "a", Some(100L)), (2L, "a", None))
      .toDF("id", "k", "sec")
      .select(col("id"), col("k"), timestamp_seconds(col("sec")).as("ts"))
    assert(collectMap(AsofJoin.asof(l, rhs, Seq("k"), "ts", "rts"))(2L) == None)
    assert(
      collectMap(AsofJoin.asof(l, rhs, Seq("k"), "ts", "rts", direction = "forward"))(2L) == None
    )
  }

  test("plan: one hash exchange on the key, no join operator at all") {
    val plan = AsofJoin.asof(lhs, rhs, Seq("k"), "ts", "rts").queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.toLowerCase.contains("cartesian"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("colliding right payload names fail loudly") {
    val bad = rhs.withColumnRenamed("rv", "ts2").withColumnRenamed("ts2", "id")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asof(lhs, bad, Seq("k"), "ts", "rts")
    }
    assert(e.getMessage.contains("collide"))
  }
}
