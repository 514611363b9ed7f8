package graft.graph

import graft.SparkSpec

/** Exact triangle counting goldens. */
class TrianglesSpec extends SparkSpec {

  import spark.implicits._

  test("K4: every vertex sits in C(3,2)=3 triangles; direction/dupes/self-loops ignored") {
    val k4 = (for { a <- 0L to 3L; b <- 0L to 3L if a != b } yield (a, b)) :+ ((2L, 2L))
    val got = Triangles.perNode(k4.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("a square has no triangles; adding one diagonal creates two") {
    val square = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    val got0 = Triangles.perNode(square.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got0.values.forall(_ == 0L))
    val got1 = Triangles.perNode((square :+ ((0L, 2L))).toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got1 == Map(0L -> 2L, 1L -> 1L, 2L -> 2L, 3L -> 1L))
  }
}
