package graft.snapshot

import graft.SparkSpec

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  // (key, version, is_delete, value)
  private def base = Seq(
    ("k1", 1L, false, "a"),
    ("k2", 1L, false, "b"),
    ("k3", 1L, false, "c"),
    ("k4", 5L, false, "d")
  ).toDF("k", "v", "is_delete", "payload")

  private def changes = Seq(
    ("k2", 2L, false, "b2"),  // higher version replaces
    ("k3", 2L, true, "c"),    // tombstone removes the key
    ("k4", 5L, false, "d2"),  // EQUAL version: change side wins
    ("k5", 1L, false, "e"),   // new key inserts
    ("k6", 1L, true, "x"),    // tombstone...
    ("k6", 2L, false, "x2")   // ...then a later re-insert survives
  ).toDF("k", "v", "is_delete", "payload")

  private def run() =
    Upsert
      .merge(base, changes, Seq("k"), Seq("v"), "is_delete")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2))))
      .toMap

  test("latest-wins merge: replace, equal-version change priority, tombstone, re-insert") {
    val got = run()
    assert(got == Map(
      "k1" -> ((1L, "a")),
      "k2" -> ((2L, "b2")),
      "k4" -> ((5L, "d2")),
      "k5" -> ((1L, "e")),
      "k6" -> ((2L, "x2"))
    ))
  }

  test("schema mismatch and missing version columns are rejected") {
    intercept[IllegalArgumentException] {
      Upsert.merge(base, changes.drop("payload"), Seq("k"), Seq("v"), "is_delete")
    }
    intercept[IllegalArgumentException] {
      Upsert.merge(base, changes, Seq("k"), Seq(), "is_delete")
    }
  }
}
