package graft.rollup

import graft.SparkSpec

class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  test("emits only disagreements, labeled; agreement (incl. null==null) is silent") {
    val a = Seq(
      ("k1", Some(10L)), // agrees
      ("k2", Some(20L)), // mismatch
      ("k3", None),      // null == null agrees
      ("k4", Some(40L))  // missing in b
    ).toDF("key", "m")
    val b = Seq(
      ("k1", Some(10L)),
      ("k2", Some(21L)),
      ("k3", None),
      ("k5", Some(50L)) // missing in a
    ).toDF("key", "m")

    val got = Reconcile
      .diff(a, b, Seq("key"), Seq("m"))
      .collect()
      .map { r =>
        val am = if (r.isNullAt(1)) None else Some(r.getLong(1))
        val bm = if (r.isNullAt(2)) None else Some(r.getLong(2))
        (r.getString(0), am, bm, r.getString(3))
      }
      .toSet

    assert(
      got == Set(
        ("k2", Some(20L), Some(21L), "mismatch"),
        ("k4", Some(40L), None, "missing_b"),
        ("k5", None, Some(50L), "missing_a")
      )
    )
  }

  test("identical tables reconcile to the empty certificate") {
    val a = Seq(("k", 1L, 2L)).toDF("key", "m1", "m2")
    assert(Reconcile.diff(a, a, Seq("key"), Seq("m1", "m2")).count() == 0L)
  }

  test("null vs value on one side is a mismatch") {
    val a = Seq(("k", Option.empty[Long])).toDF("key", "m")
    val b = Seq(("k", Some(1L))).toDF("key", "m")
    val got = Reconcile.diff(a, b, Seq("key"), Seq("m")).collect()
    assert(got.length == 1 && got.head.getString(3) == "mismatch")
  }
}
