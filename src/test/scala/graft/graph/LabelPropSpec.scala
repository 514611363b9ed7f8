package graft.graph

import graft.SparkSpec

class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  private def labels(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.as[(Long, Long)].collect().toMap

  test("two disconnected triangles converge to their min-node labels") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (11L, 12L), (12L, 13L), (13L, 11L)).toDF("src", "dst")
    val got = labels(LabelProp.communities(e, "src", "dst", iters = 3))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 11L -> 11L, 12L -> 11L, 13L -> 11L))
  }

  test("synchronous rounds: all updates read the PREVIOUS labels (triangle round 1)") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    // round 1 (undirected): v1 sees {2,3} -> 2; v2 sees {1,3} -> 1; v3 sees {1,2} -> 1
    assert(labels(LabelProp.communities(e, "src", "dst", iters = 1)) == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("frequency beats id: the majority label wins even when larger; ties go small") {
    // into v1: label 7 twice (multi-edge), label 2 once -> 7 outvotes smaller 2
    val e = Seq((7L, 1L), (7L, 1L), (2L, 1L)).toDF("src", "dst")
    val got = labels(LabelProp.communities(e, "src", "dst", iters = 1, undirected = false))
    assert(got(1L) == 7L)
    // into v9: labels {3, 5} once each -> tie resolves to the SMALLEST
    val tie = Seq((3L, 9L), (5L, 9L)).toDF("src", "dst")
    assert(labels(LabelProp.communities(tie, "src", "dst", iters = 1, undirected = false))(9L) == 3L)
  }

  test("directed mode: labels flow along edges only; no-inbound nodes keep theirs") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val got = labels(LabelProp.communities(e, "src", "dst", iters = 2, undirected = false))
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }
}
