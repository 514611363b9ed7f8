package graft.operators

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables join with ZERO exchanges (co-located SMJ)") {
    val base = Files.createTempDirectory("bkt").toString
    val facts = (1L to 200L).map(i => (i, i % 37, s"t${i % 3}")).toDF("id", "uid", "kind")
    val dim = (0L until 37L).map(u => (u, u % 5)).toDF("uid", "cohort")
    Bucketing.writeBucketed(facts, "bkt_facts", s"$base/facts", "uid", 8)
    Bucketing.writeBucketed(dim, "bkt_dim", s"$base/dim", "uid", 8)
    val joined = Bucketing.colocatedJoin(spark, "bkt_facts", "bkt_dim", "uid")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan) // the whole point of the layout
    assert(plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("SelectedBucketsCount: 8 out of 8"), plan)
    assert(joined.count() == 200L)
    // answer parity with the plain (shuffled) join
    val plain = facts.join(dim, "uid").groupBy("cohort").count().as[(Long, Long)].collect().toMap
    val bucketed = joined.groupBy("cohort").count().as[(Long, Long)].collect().toMap
    assert(plain == bucketed)
  }

  test("mismatched bucket counts fall back to a correct (exchanged) join") {
    val base = Files.createTempDirectory("bkt").toString
    val a = (1L to 50L).map(i => (i, i % 7)).toDF("id", "uid")
    val b = (0L until 7L).map(u => (u, s"d$u")).toDF("uid", "tag")
    Bucketing.writeBucketed(a, "bkt_a5", s"$base/a", "uid", 5)
    Bucketing.writeBucketed(b, "bkt_b8", s"$base/b", "uid", 8)
    val joined = Bucketing.colocatedJoin(spark, "bkt_a5", "bkt_b8", "uid")
    assert(joined.count() == 50L) // correctness never depends on the layout
  }
}
