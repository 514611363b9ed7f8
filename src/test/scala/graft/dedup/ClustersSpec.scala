package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  test("two components: a chain and a pair, labels converge to the minimum id") {
    // chain 1-2-3-4 (diameter 3) + pair 10-11
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val got = Clusters
      .connectedComponents(edges, "a", "b")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("star graph converges in one flow round regardless of size") {
    val edges = (2L to 40L).map(i => (1L, i)).toDF("a", "b")
    val got = Clusters.connectedComponents(edges, "a", "b", maxIter = 3).collect()
    assert(got.length == 40 && got.forall(_.getLong(1) == 1L))
  }

  test("dedupDecision: smallest id per component is canonical") {
    val pairs = Seq((5L, 9L), (9L, 7L), (20L, 21L)).toDF("a", "b")
    val got = Clusters
      .dedupDecision(pairs, "a", "b")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(got == Map(
      5L -> ((5L, true)), 7L -> ((5L, false)), 9L -> ((5L, false)),
      20L -> ((20L, true)), 21L -> ((20L, false))
    ))
  }

  test("maxIter too small for the diameter fails loudly, never a partial clustering") {
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("a", "b")
    val err = intercept[IllegalArgumentException] {
      Clusters.connectedComponents(chain, "a", "b", maxIter = 2).collect()
    }
    assert(err.getMessage.contains("did not converge"))
  }
}
