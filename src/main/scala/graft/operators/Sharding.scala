package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic shard routing: assign every row a stable shard id so
  * a corpus can be split into N training shards that (a) never change
  * across runs, task retries, or cluster layouts, (b) keep all copies
  * of the same id on the same shard (join/dedup-compatible), and
  * (c) balance by the law of large numbers rather than by a stateful
  * packer. The same portable md5-prefix hash as [[Sampling]], reduced
  * mod N — any engine reproduces the assignment bit-for-bit.
  *
  * `balance` is the audit: per-shard row and weight totals (exact
  * integers) to verify the spread before a long training run.
  *
  * Scale shape: `route` is a pure projection (no shuffle — the shard
  * column can then drive a `repartition`/`partitionBy` write);
  * `balance` is one partial-aggregated groupBy to N rows.
  */
object Sharding {

  def shardOf(id: Column, nShards: Int, salt: String): Column = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    pmod(
      conv(substring(md5(concat(id.cast("string"), lit("|"), lit(salt))), 1, 15), 16, 10)
        .cast("bigint"),
      lit(nShards.toLong)
    )
  }

  /** Adds a `shard` column in [0, nShards). */
  def route(df: DataFrame, idCol: String, nShards: Int, salt: String): DataFrame =
    df.withColumn("shard", shardOf(col(idCol), nShards, salt))

  /** Per-shard audit: (shard, n_rows, weight_sum). */
  def balance(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      nShards: Int,
      salt: String
  ): DataFrame =
    route(df, idCol, nShards, salt)
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col(weightCol).cast("long")).as("weight_sum")
      )
}
