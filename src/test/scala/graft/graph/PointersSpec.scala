package graft.graph

import graft.SparkSpec

class PointersSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Boolean)] =
    df.as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("reach squares per round: a 7-hop chain resolves in 3 rounds, not 2") {
    // chain 1 -> 2 -> ... -> 8 (7 redirects, sink 8)
    val chain = (1L to 7L).map(i => (i, i + 1)).toDF("src", "dst")
    val r3 = rows(Pointers.resolveChains(chain, "src", "dst", rounds = 3))
    assert(r3(1L) == (8L, true)) // 7 hops <= 2^3
    assert(r3.values.forall(_._2))
    val r2 = rows(Pointers.resolveChains(chain, "src", "dst", rounds = 2))
    assert(!r2(1L)._2) // 7 hops > 2^2: still mid-chain
    assert(r2(4L) == (8L, true)) // 4 hops from node 4
  }

  test("branches into a shared sink resolve independently") {
    val map = Seq((1L, 3L), (2L, 3L), (3L, 9L)).toDF("src", "dst")
    val got = rows(Pointers.resolveChains(map, "src", "dst", rounds = 2))
    assert(got == Map(1L -> (9L, true), 2L -> (9L, true), 3L -> (9L, true)))
  }

  test("cycles surface as resolved = false, never hang") {
    val cyc = Seq((1L, 2L), (2L, 1L), (5L, 6L)).toDF("src", "dst")
    val got = rows(Pointers.resolveChains(cyc, "src", "dst", rounds = 4))
    assert(!got(1L)._2 && !got(2L)._2)
    assert(got(5L) == (6L, true))
  }
}
