package graft.snapshot

import graft.rollup.{Rollup, Tiers}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Continuous aggregates over an Iceberg-lite snapshot table
  * (SURVEY.md §2.10): tier tables are kept up to date by recomputing
  * ONLY the tier partitions touched by rows added since the last
  * applied snapshot (the snapshot manifest diff), via dynamic
  * partition overwrite.
  *
  * Partitioning: 1m/1h/1d tiers partition by the point day (`part_key`
  * = bucket day); the 30d tier partitions by its window start. A
  * touched partition is recomputed WHOLE from the source restricted to
  * that partition's time range — so the update is a pure function of
  * (source ≤ snapshot N), which makes it:
  *   - idempotent: a crash between tier writes and the `_applied`
  *     marker re-runs the same recompute and overwrites identical
  *     bytes;
  *   - late-data-safe: pages with old `warc_ts` in a new snapshot
  *     re-touch old partitions through the same path (no watermark
  *     drop).
  *
  * Scale notes: `allRows` below prunes to touched partitions via a
  * broadcast semi-join on the partition key; on a partitioned source
  * table that predicate is partition pruning at the scan. Only new
  * files decide WHAT to recompute — manifests are directory-level, so
  * the diff never scans data.
  *
  * Per-partition lineage rows + per-run metrics append to
  * `tiersRoot/_lineage` / `tiersRoot/_metrics`.
  */
object ContinuousRollup {

  private def appliedPath(tiersRoot: String) = Paths.get(tiersRoot, "_applied")

  def lastApplied(tiersRoot: String): Long = {
    val p = appliedPath(tiersRoot)
    if (Files.exists(p)) new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong else 0L
  }

  private def writeApplied(tiersRoot: String, id: Long): Unit = {
    Files.createDirectories(Paths.get(tiersRoot))
    val tmp = Files.createTempFile(Paths.get(tiersRoot), ".tmp", ".marker")
    Files.write(tmp, id.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(
      tmp,
      appliedPath(tiersRoot),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING
    )
  }

  private def tierPath(tiersRoot: String, tier: String) = s"$tiersRoot/tier_$tier"

  def readTier(spark: SparkSession, tiersRoot: String, tier: String): DataFrame =
    spark.read.parquet(tierPath(tiersRoot, tier)).drop("part_key")

  /** Partition key of a raw point for a tier: the day (1m/1h/1d) or
    * the 30d window start — chosen so recomputing a partition needs
    * exactly the raw rows carrying that key.
    */
  private def partKeyOfPoint(tsCol: String, tier: String): Column = tier match {
    case "30d" => to_date(Tiers.bucket(col(tsCol), "30d"))
    case _     => to_date(date_trunc("day", col(tsCol)))
  }

  private def partKeyOfBucket(tier: String): Column = tier match {
    case "30d" => to_date(col("bucket_ts"))
    case _     => to_date(date_trunc("day", col("bucket_ts")))
  }

  /** Days whose stored `part_day` cannot be trusted to equal the
    * prepared row's day: corrupt-timestamp sentinels (at/under the
    * epoch) that `prepare` may repair into any real day. Such
    * partitions are always read by pruned updates.
    */
  def defaultSuspectDay(dayToken: String): Boolean =
    dayToken <= "1970-01-02" // ISO dates compare lexicographically

  /** Fold all snapshots newer than the applied marker into every tier.
    * Returns the new applied snapshot id (unchanged if nothing new).
    *
    * `prepare` runs on the raw source rows BEFORE partition keys are
    * derived (e.g. the pages repair stage: corrupted `warc_ts` must be
    * repaired first, because the repaired timestamp decides which tier
    * partitions a row touches). Contract for incremental correctness:
    * repairs of the partition-deciding timestamp must be row-local
    * (the pages pipeline re-parses it from the row's own html);
    * model-based repairs of other columns see exactly the rows of the
    * partitions being recomputed, so pass a prepare whose models are
    * either maintained externally (see `graft.Main`'s incremental
    * lang-count model) or per-partition-stable.
    *
    * I/O is incremental, not just compute: when the source snapshots
    * were appended with a `tsCol` (day-partitioned data + manifest day
    * lists), the full-range scan is pruned at FILE level to the days
    * of the touched tier partitions (expanded to whole 30d windows)
    * plus suspect-day partitions — nothing else is opened. Without day
    * manifests it falls back to the full-range scan.
    */
  def update(
      spark: SparkSession,
      sourceRoot: String,
      tiersRoot: String,
      series: Seq[String],
      tsCol: String,
      sizeCol: Column,
      langCol: Option[String] = None,
      prepare: DataFrame => DataFrame = identity,
      suspectDay: String => Boolean = defaultSuspectDay
  ): Long = {
    val from = lastApplied(tiersRoot)
    val to = SnapshotStore.currentSnapshotId(sourceRoot)
    if (to <= from) return from

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    // an empty day-partitioned append commits a manifest with no data
    // dirs at all — nothing to fold, mark applied and return
    if (SnapshotStore.resolveDirs(sourceRoot, from, to).isEmpty) {
      writeApplied(tiersRoot, to)
      return to
    }

    // consumed once for the touched-day set and once per tier for the
    // touched part_key sets — cache, or the batch re-reads and
    // re-prepares five times
    val newRows = prepare(SnapshotStore.readRange(spark, sourceRoot, from, to)).cache()

    val canPrune = SnapshotStore.hasDayInfo(sourceRoot, 0L, to)
    val (allRows, dirsRead, dirsTotal) =
      if (!canPrune) {
        val dirs = SnapshotStore.resolveDirs(sourceRoot, 0L, to)
        (prepare(spark.read.parquet(dirs: _*)), dirs.size, dirs.size)
      } else {
        // one tiny job over the prepared batch: the days its points
        // land on (post-repair) and the 30d windows they touch; windows
        // expand to their full day span so a touched 30d partition can
        // recompute from raw
        val touched = newRows
          .select(
            to_date(col(tsCol)).as("d"),
            to_date(Tiers.bucket(col(tsCol), "30d")).as("w")
          )
          .distinct()
          .collect()
        val days = touched.iterator.filterNot(_.isNullAt(0)).map(_.getDate(0).toLocalDate).toSet
        val windows = touched.iterator.filterNot(_.isNullAt(1)).map(_.getDate(1).toLocalDate).toSet
        val needed: Set[String] =
          (days ++ windows.flatMap(w => (0 until 30).map(i => w.plusDays(i.toLong))))
            .map(_.toString)
        val dirs = SnapshotStore.resolveDirs(sourceRoot, 0L, to, Some(needed), suspectDay)
        val total = SnapshotStore.resolveDirs(sourceRoot, 0L, to)
        (prepare(spark.read.parquet(dirs: _*)), dirs.size, total.size)
      }

    val lineageRows = scala.collection.mutable.ArrayBuffer[(String, String, Long, Long, Long)]()
    val t0 = System.nanoTime()

    // one scan + one prepare feeds all four tier recomputes
    allRows.cache()

    Tiers.All.foreach { tier =>
      val touched = newRows.select(partKeyOfPoint(tsCol, tier).as("part_key")).distinct()
      val affected = allRows
        .withColumn("part_key", partKeyOfPoint(tsCol, tier))
        .join(broadcast(touched), Seq("part_key"), "left_semi")
      // cluster rows by their output partition before the partitioned
      // write: otherwise every shuffle task holds rows of every
      // part_key and the write fans out |tasks| × |partitions| tiny
      // files. Range-partitioning on (part_key, series) instead of
      // hash-on-part_key keeps the clustering AND splits a hot
      // partition (e.g. one day holding most of a Zipf-skewed
      // domain's points) across multiple writer tasks by series
      // range — no single-writer bottleneck, file count still
      // bounded by the range bucket count
      val recomputed = Rollup
        .fromRaw(affected, series, tsCol, tier, sizeCol, langCol = langCol)
        .withColumn("part_key", partKeyOfBucket(tier))
        .repartitionByRange((col("part_key") +: series.map(col)): _*)
      val path = tierPath(tiersRoot, tier)
      val exists = Files.exists(Paths.get(path))
      val out = recomputed.cache()
      out.write
        .mode(if (exists) "overwrite" else "errorifexists")
        .partitionBy("part_key")
        .parquet(path)
      // one aggregate over the cached result for both lineage numbers
      val stats = out.agg(count(lit(1)), countDistinct(col("part_key"))).head()
      lineageRows += ((tier, s"($from,$to]", stats.getLong(0), stats.getLong(1), to))
      out.unpersist()
    }

    import spark.implicits._
    lineageRows.toSeq
      .toDF("tier", "snapshot_range", "rows_out", "partitions_touched", "applied_snapshot")
      .write
      .mode("append")
      .parquet(s"$tiersRoot/_lineage")
    Seq((to, (System.nanoTime() - t0) / 1e9, java.time.Instant.now.toString, dirsRead, dirsTotal))
      .toDF("applied_snapshot", "update_seconds", "wall_clock", "source_dirs_read", "source_dirs_total")
      .write
      .mode("append")
      .parquet(s"$tiersRoot/_metrics")

    allRows.unpersist()
    newRows.unpersist()
    writeApplied(tiersRoot, to)
    to
  }
}
