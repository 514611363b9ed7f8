package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  test("routing is deterministic, stable per id, and covers [0, nShards)") {
    val df = (0L until 200L).map(i => (i, i * 10)).toDF("id", "w")
    val a = Sharding.route(df, "id", 16, "s").select("id", "shard").collect()
    val b = Sharding.route(df, "id", 16, "s").select("id", "shard").collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      b.map(r => (r.getLong(0), r.getLong(1))).toSet)
    val shards = a.map(_.getLong(1))
    assert(shards.forall(s => s >= 0 && s < 16))
    assert(shards.distinct.length > 8) // 200 ids spread over most of 16 shards
  }

  test("different salt draws an independent assignment") {
    val df = (0L until 100L).map(i => Tuple1(i)).toDF("id")
    val s1 = Sharding.route(df, "id", 16, "a").select("id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s2 = Sharding.route(df, "id", 16, "b").select("id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 100L).count(i => s1(i) != s2(i)) > 50)
  }

  test("balance totals reconcile with the input") {
    val df = (0L until 128L).map(i => (i, 2L)).toDF("id", "w")
    val bal = Sharding.balance(df, "id", "w", 4, "s").collect()
    assert(bal.map(_.getLong(1)).sum == 128L)
    assert(bal.map(_.getLong(2)).sum == 256L)
  }

  test("bad shard count is rejected") {
    intercept[IllegalArgumentException] {
      Sharding.shardOf(lit(1L), 0, "s")
    }
  }
}
