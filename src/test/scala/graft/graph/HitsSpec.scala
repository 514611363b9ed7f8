package graft.graph

import graft.SparkSpec

/** Fixed-point HITS goldens and invariances. */
class HitsSpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed one-round golden") {
    val edges = Seq((0L, 2L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = Hits.scores(edges, "src", "dst", iters = 1, scale = 1000L)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // h0=1000 everywhere. auth raw: 2->2000, 3->1000; normalized 1000/500.
    // hub raw: 0->1000, 1->1000, 2->500; normalized 1000/1000/500.
    assert(got == Map(
      0L -> ((0L, 1000L)),
      1L -> ((0L, 1000L)),
      2L -> ((1000L, 500L)),
      3L -> ((500L, 0L))))
  }

  test("a symmetric cycle is uniform on both sides at any depth") {
    val n = 5L
    val edges = (0L until n).map(i => (i, (i + 1) % n)).toDF("src", "dst")
    val got = Hits.scores(edges, "src", "dst", iters = 4).as[(Long, Long, Long)].collect()
    assert(got.length == n)
    assert(got.map(_._2).distinct.toSeq == Seq(1000000L))
    assert(got.map(_._3).distinct.toSeq == Seq(1000000L))
  }

  test("parallelism invariance") {
    val edges = Seq((0L, 2L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 3L)).toDF("src", "dst")
    val a = Hits.scores(edges, "src", "dst", iters = 3).as[(Long, Long, Long)].collect().toSet
    val b = Hits.scores(edges.repartition(1), "src", "dst", iters = 3).as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }
}
