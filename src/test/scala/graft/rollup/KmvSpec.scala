package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("below k distinct values the sketch is exact") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("a", 3L), ("b", 9L)).toDF("g", "v")
    val got = Kmv
      .distinctEstimate(df, Seq("g"), "v", k = 64)
      .select("g", "k_used", "est_distinct")
      .as[(String, Long, Double)]
      .collect()
      .map(r => r._1 -> r)
      .toMap
    assert(got("a")._2 == 3L && got("a")._3 == 3.0)
    assert(got("b")._2 == 1L && got("b")._3 == 1.0)
  }

  test("estimate lands near truth and is duplication-invariant") {
    val base = (1L to 5000L).map(v => ("g", v))
    val df = (base ++ base ++ base).toDF("g", "v") // 3x duplicated, 5000 distinct
    val row = Kmv.distinctEstimate(df, Seq("g"), "v", k = 256).collect()(0)
    assert(row.getAs[Long]("k_used") == 256L)
    val est = row.getAs[Double]("est_distinct")
    assert(math.abs(est - 5000.0) / 5000.0 < 0.15, s"estimate $est") // ~1/sqrt(k) error
  }

  test("merge = union + min-k: the re-rolled sketch equals the whole-corpus sketch") {
    // the tier-cascade property: sketch(day1 U day2) from the kept
    // hashes of each day equals sketch over all rows
    val d1 = (1L to 300L).map(v => ("g", v)).toDF("g", "v")
    val d2 = (200L to 500L).map(v => ("g", v)).toDF("g", "v")
    val whole = Kmv.distinctEstimate(d1.union(d2), Seq("g"), "v", k = 32).collect()(0)
    // per-day kept hashes (k smallest each) stand in for the stored tier sketches
    val h = conv(substring(md5(col("v").cast("string")), 1, 15), 16, 10).cast("long")
    def kept(df: org.apache.spark.sql.DataFrame) =
      df.select(h.as("__h")).distinct().orderBy("__h").limit(32)
    val merged = kept(d1)
      .union(kept(d2))
      .distinct()
      .orderBy("__h")
      .limit(32)
      .agg(count(lit(1)).as("k_used"), max(col("__h")).as("kth_hash"))
      .collect()(0)
    assert(merged.getAs[Long]("k_used") == 32L)
    assert(merged.getAs[Long]("kth_hash") == whole.getAs[Long]("kth_hash"))
  }
}
