package graft.graph

import graft.SparkSpec

/** Multi-source BFS level goldens. */
class BfsSpec extends SparkSpec {

  import spark.implicits._

  private val edges =
    Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (5L, 0L), (7L, 6L)).toDF("src", "dst")

  private def run(seeds: Seq[Long], depth: Int): Map[Long, Long] =
    Bfs.levels(edges, "src", "dst", seeds.toDF("v"), "v", depth)
      .as[(Long, Long)].collect().toMap

  test("levels are minimum hop counts; unreached vertices are absent") {
    assert(run(Seq(0L), 10) == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
    assert(run(Seq(0L), 3) == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("multi-source takes the nearest seed; directed edges are not followed backwards") {
    val got = run(Seq(0L, 3L), 10)
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 0L, 4L -> 1L))
    // 5 -> 0 exists but 0 -/-> 5: vertex 5 stays unreached
    assert(!got.contains(5L))
  }

  test("depth 0 returns exactly the seed set") {
    assert(run(Seq(2L, 6L), 0) == Map(2L -> 0L, 6L -> 0L))
  }
}
