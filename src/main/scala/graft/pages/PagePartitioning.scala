package graft.pages

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Canonical storage layout + skew handling for the pages table
  * (north rule: "explicit bucket-by-domain-hash plus time-range
  * partitions with salting for hot-domain skew").
  *
  *  - at rest: `repartitionByRange(warc_ts)` (time-range files, the
  *    property the incremental tier update and partial aggregation
  *    exploit) with `domain_bucket = pmod(xxhash64(domain), B)` as a
  *    secondary sort/bucket column for co-located domain joins;
  *  - in flight: Zipf-skewed domains (one domain can carry >25% of a
  *    crawl) get an explicit salt so a domain-keyed shuffle spreads
  *    over `saltFactor` reducers; aggregate in two phases (per-salt
  *    partial, then merge) — `saltedAgg` below. AQE skew-join handles
  *    the join side at runtime (`Sessions` enables it).
  */
object PagePartitioning {

  def domainBucket(domain: Column, buckets: Int): Column =
    pmod(xxhash64(domain), lit(buckets.toLong))

  /** Write-side layout: time-range partitions, bucketed by domain
    * hash within each range (sortWithinPartitions keeps row groups
    * domain-clustered for selective domain scans).
    */
  def canonicalLayout(pages: DataFrame, files: Int, buckets: Int): DataFrame =
    pages
      .withColumn("domain_bucket", domainBucket(PageGen.domainOf("url"), buckets))
      .repartitionByRange(files, col("warc_ts"))
      .sortWithinPartitions("domain_bucket")

  /** Hot keys by share: the top-k keys by row count (driver-collected,
    * k tiny) — the explicit salting set.
    */
  def hotKeys(df: DataFrame, keyCol: String, topK: Int): Seq[String] =
    df.groupBy(keyCol)
      .count()
      .orderBy(col("count").desc, col(keyCol).asc)
      .limit(topK)
      .collect()
      .map(_.get(0).toString)
      .toSeq

  /** Salt column: hot keys fan out over `saltFactor` salts (stable
    * per row via xxhash64 of the row key), cold keys keep salt 0 — so
    * only genuinely hot groups pay the extra merge.
    */
  def saltFor(keyCol: Column, rowKey: Column, hot: Seq[String], saltFactor: Int): Column =
    when(keyCol.isin(hot: _*), pmod(xxhash64(rowKey), lit(saltFactor.toLong)))
      .otherwise(lit(0L))

  /** Two-phase skew-safe aggregation: per (key, salt) partial counts /
    * sums, then merge per key. Counts and decimal-cast sums are
    * associative, so the result is exactly the unsalted aggregate.
    */
  def saltedAgg(
      df: DataFrame,
      keyCol: String,
      rowKey: String,
      aggs: Map[String, Column],
      hot: Seq[String],
      saltFactor: Int = 16
  ): DataFrame = {
    val salted = df.withColumn("__salt", saltFor(col(keyCol), col(rowKey), hot, saltFactor))
    val partialAggs = aggs.toSeq.sortBy(_._1).map { case (n, c) => c.as(n) }
    val partial = salted.groupBy(col(keyCol), col("__salt")).agg(partialAggs.head, partialAggs.tail: _*)
    val mergeAggs = aggs.keys.toSeq.sorted.map(n => sum(col(n)).as(n))
    partial.groupBy(col(keyCol)).agg(mergeAggs.head, mergeAggs.tail: _*)
  }
}
