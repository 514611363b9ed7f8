package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — the SHUFFLE-ELIMINATION lever the north
  * rule's "bucket-by-domain-hash" partitioning calls for: both sides
  * of a recurring equi-join are written hash-routed into the same
  * number of buckets on the join key (and sorted within buckets), so
  * every subsequent join of the two tables is CO-LOCATED — the
  * planner proves bucket i of A can only match bucket i of B and
  * emits a sort-merge join with ZERO exchanges (the per-partition
  * Sort remains — Spark only trusts bucket sort order behind a
  * legacy flag — but it runs over `sortBy`-presorted runs, locally,
  * with nothing on the wire). At 100 TB this turns the nightly
  * fact⋈dim or fact⋈fact join from "shuffle 100 TB" into "zip
  * pre-sorted files" — the single biggest recurring-pipeline saving
  * bucketing buys, paid for once at write time.
  *
  * Mechanics: Spark's native bucketing (`bucketBy` + `saveAsTable`)
  * records the bucket spec in the catalog; `option("path", ...)`
  * keeps the table EXTERNAL so data lands under the given path, not
  * the session warehouse. Joins avoid the exchange when both tables
  * have the same bucket count on the join key and
  * `spark.sql.sources.bucketing.enabled` is on (default).
  */
object Bucketing {

  /** Write `df` as an external bucketed+sorted table; re-read via
    * `spark.table(name)` (bucket metadata lives in the catalog, not
    * the files — a plain parquet read of `path` won't co-locate).
    */
  def writeBucketed(df: DataFrame, name: String, path: String, keyCol: String, buckets: Int): Unit = {
    // the name is interpolated into raw SQL — identifier-validate it
    // (same pattern as Refs ref names) so a crafted name can neither
    // break the statement nor smuggle extra SQL
    require(name.matches("[A-Za-z0-9_]+"), s"table name must be [A-Za-z0-9_]+, got '$name'")
    df.sparkSession.sql(s"DROP TABLE IF EXISTS `$name`")
    df
      // repartition on the SAME hash the bucketer uses so each write
      // task owns exactly one bucket -> ONE file per bucket, which is
      // what lets the reader elide the per-bucket Sort as well as the
      // Exchange (multi-file buckets are only file-wise sorted).
      // Size buckets so one bucket's data is a sane task unit — at
      // 100 TB that means thousands of buckets, not 8.
      .repartition(buckets, org.apache.spark.sql.functions.col(keyCol))
      .write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(name)
  }

  /** Co-located inner equi-join of two same-bucketed catalog tables.
    *
    * `forceMerge = true` (default) pins the sort-merge strategy via
    * the MERGE hint: on matching bucket layouts that join zips
    * pre-sorted bucket files with ZERO exchanges and zero sorts.
    * Without the hint the planner may prefer a broadcast for a small
    * side — also exchange-free on the big side, but it re-ships the
    * small table every run, which is exactly what a recurring
    * bucketed fact⋈fact layout is built to avoid. Pass `false` to
    * let the planner choose.
    */
  def colocatedJoin(
      spark: SparkSession,
      tableA: String,
      tableB: String,
      key: String,
      forceMerge: Boolean = true
  ): DataFrame = {
    val a = spark.table(tableA)
    val left = if (forceMerge) a.hint("merge") else a
    left.join(spark.table(tableB), key)
  }
}
