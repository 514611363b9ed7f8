package graft.graph

import graft.SparkSpec

/** Fixed-point PageRank: hand-computed goldens, invariance checks. */
class PageRankSpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed one-iteration golden on a 3-node graph") {
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val r = PageRank.ranks(edges, "src", "dst", iters = 1)
      .as[(Long, Long)].collect().toMap
    // N=3, r0=333333, teleport=50000:
    //   r1(0) = 50000 + 85*333333//100           = 333333
    //   r1(1) = 50000 + 85*(333333//2)//100      = 191666
    //   r1(2) = 50000 + 85*(166666+333333)//100  = 474999
    assert(r == Map(0L -> 333333L, 1L -> 191666L, 2L -> 474999L))
  }

  test("a uniform cycle keeps uniform ranks at any depth") {
    val n = 6L
    val edges = (0L until n).map(i => (i, (i + 1) % n)).toDF("src", "dst")
    val r = PageRank.ranks(edges, "src", "dst", iters = 5).as[(Long, Long)].collect()
    assert(r.length == n && r.map(_._2).distinct.toSeq == Seq(1000000L / n))
  }

  test("personalized: teleport returns only to seeds; unreached-from-seeds nodes drain to 0") {
    val edges = Seq((0L, 1L), (1L, 0L), (2L, 0L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("v")
    def run(i: Int) = PageRank.personalized(edges, "src", "dst", seeds, "v", iters = i)
      .as[(Long, Long)].collect().toMap
    // r0 = (1000000, 0, 0), base(0)=150000:
    //   iter1: r=(150000, 850000, 0)
    //   iter2: r=(150000 + 85*850000//100, 85*150000//100, 0)
    assert(run(1) == Map(0L -> 150000L, 1L -> 850000L, 2L -> 0L))
    assert(run(2) == Map(0L -> 872500L, 1L -> 127500L, 2L -> 0L))
  }

  test("rank mass is conserved up to floor loss and a sink-free graph converges toward the hub") {
    // star with a return path: every spoke points at the hub, hub cycles the spokes
    val spokes = (1L to 9L)
    val edges = (spokes.map(i => (i, 0L)) ++ spokes.map(i => (0L, i))).toDF("src", "dst")
    val r = PageRank.ranks(edges, "src", "dst", iters = 8).as[(Long, Long)].collect().toMap
    assert(r(0L) > r(1L) * 5, s"hub should dominate: ${r(0L)} vs ${r(1L)}")
    val total = r.values.sum
    assert(total <= 1000000L && total > 900000L, s"mass $total")
    // deterministic across parallelism: same input at 1 partition
    val r1p = PageRank.ranks(edges.repartition(1), "src", "dst", iters = 8).as[(Long, Long)].collect().toMap
    assert(r1p == r)
  }
}
