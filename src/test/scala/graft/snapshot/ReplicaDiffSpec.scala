package graft.snapshot

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ReplicaDiffSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(rows: (String, Long, String)*) = rows.toDF("day", "id", "payload")

  private def statuses(d: org.apache.spark.sql.DataFrame): Map[String, String] =
    d.select("day", "status").as[(String, String)].collect().toMap

  test("identical replicas match on every partition") {
    val a = tbl(("d1", 1L, "x"), ("d1", 2L, "y"), ("d2", 3L, "z"))
    val got = statuses(ReplicaDiff.diff(a, a, Seq("day"), Seq("id", "payload")))
    assert(got == Map("d1" -> "match", "d2" -> "match"))
  }

  test("content change, missing rows, and missing partitions are classified per side") {
    val a = tbl(("d1", 1L, "x"), ("d1", 2L, "y"), ("d2", 3L, "z"), ("d3", 4L, "w"))
    val b = tbl(("d1", 1L, "x"), ("d1", 2L, "CHANGED"), ("d2", 3L, "z"), ("d4", 5L, "v"))
    val got = statuses(ReplicaDiff.diff(a, b, Seq("day"), Seq("id", "payload")))
    assert(got == Map("d1" -> "diverged", "d2" -> "match", "d3" -> "missing_in_b", "d4" -> "missing_in_a"))
  }

  test("digest is order- and partitioning-free; count catches XOR-cancelling duplicates") {
    val a = tbl(("d1", 1L, "x"), ("d1", 2L, "y"))
    val shuffled = a.orderBy(col("id").desc).repartition(7)
    assert(statuses(ReplicaDiff.diff(a, shuffled, Seq("day"), Seq("id", "payload"))) == Map("d1" -> "match"))
    // duplicate pair XORs to the same digest — n_rows must flag it
    val dup = tbl(("d1", 1L, "x"), ("d1", 2L, "y"), ("d1", 2L, "y"), ("d1", 2L, "y"))
    assert(statuses(ReplicaDiff.diff(a, dup, Seq("day"), Seq("id", "payload"))) == Map("d1" -> "diverged"))
  }

  test("null and empty string hash differently") {
    val a = Seq(("d1", Some("x"))).toDF("day", "payload")
    val b = Seq(("d1", None: Option[String])).toDF("day", "payload")
    val e = Seq(("d1", Some(""))).toDF("day", "payload")
    assert(statuses(ReplicaDiff.diff(a, b, Seq("day"), Seq("payload"))) == Map("d1" -> "diverged"))
    assert(statuses(ReplicaDiff.diff(b, e, Seq("day"), Seq("payload"))) == Map("d1" -> "diverged"))
  }
}
