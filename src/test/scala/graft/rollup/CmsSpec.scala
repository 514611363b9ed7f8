package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CmsSpec extends SparkSpec {
  import spark.implicits._

  private val D = 3
  private val W = 64

  test("estimates never undercount; wide sketch is exact on few keys") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).map(Tuple1(_)).toDF("k")
    val st = df.agg(Cms.sketch(col("k"), D, W).as("cms"))
    val est = st
      .select(
        Cms.estimate(col("cms"), lit("a"), D, W).as("ea"),
        Cms.estimate(col("cms"), lit("b"), D, W).as("eb"),
        Cms.estimate(col("cms"), lit("c"), D, W).as("ec"),
        Cms.estimate(col("cms"), lit("never-seen"), D, W).as("ez")
      )
      .collect()
      .head
    assert(est.getLong(0) == 5L && est.getLong(1) == 3L && est.getLong(2) == 1L)
    assert(est.getLong(3) >= 0L) // may collide, never negative
  }

  test("merge of partial sketches is bit-identical to the direct sketch") {
    val all = (0L until 200L).map(i => (i % 2, s"k${i % 17}")).toDF("part", "k")
    val direct = all.agg(Cms.sketch(col("k"), D, W)).collect().head.getSeq[Long](0)
    val merged = all
      .groupBy("part")
      .agg(Cms.sketch(col("k"), D, W).as("cms"))
      .agg(Cms.mergeSketch(col("cms"), D, W))
      .collect()
      .head
      .getSeq[Long](0)
    assert(direct == merged)
    assert(direct.sum == 200L * D) // every update touches d cells
  }

  test("bad parameters rejected") {
    intercept[IllegalArgumentException] { Cms.sketch(lit("x"), 0, W) }
    intercept[IllegalArgumentException] { Cms.sketch(lit("x"), D, 1) }
  }
}
