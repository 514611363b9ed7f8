package graft.pages

import graft.SparkSpec
import graft.correct.Cells
import graft.rollup.Rollup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** North-rule E2E gate: corrupt -> detect -> repair must restore the
  * clean table exactly (byte-identical `text` per url), and tier
  * rollups of the repaired table must equal the correct-then-aggregate
  * oracle computed from the clean table in one pass.
  */
class PagesPipelineSpec extends SparkSpec {

  private val N = 4000L

  private lazy val clean = PageGen.clean(spark, N).cache()
  private lazy val dirty = PageGen.corrupt(clean, fraction = 0.05).cache()
  private lazy val repaired = PagePipeline.repair(dirty).cache()

  private def comparable(df: DataFrame): DataFrame =
    df.select(
      col("url"),
      col("warc_ts"),
      md5(col("html")).as("html_md5"),
      col("text"),
      col("lang")
    )

  private def mapFree(df: DataFrame): DataFrame =
    if (df.columns.contains("lang_hist"))
      df.withColumn("lang_hist", array_sort(map_entries(col("lang_hist"))))
    else df

  test("corruption actually dirties cells of all three classes") {
    val diff = Cells.cellDiff(
      PageGen.withRowId(dirty).withColumn("warc_ts", col("warc_ts").cast("string")),
      PageGen.withRowId(clean).withColumn("warc_ts", col("warc_ts").cast("string")),
      "row_id",
      Seq("warc_ts", "text", "lang")
    )
    val byCol = diff.groupBy("col").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byCol.keySet == Set("warc_ts", "text", "lang"), s"got $byCol")
    assert(byCol.values.forall(_ > 50), s"got $byCol")
  }

  test("repair restores the clean table exactly (incl. byte-identical text per url)") {
    val a = comparable(repaired)
    val b = comparable(clean)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)

    // explicit per-url text byte-identity vs the clean (reference
    // corrector) values
    val mismatch = repaired
      .select(col("url"), col("text").as("t1"))
      .join(clean.select(col("url"), col("text").as("t2")), "url")
      .filter(col("t1") =!= col("t2"))
      .count()
    assert(mismatch == 0L)
  }

  test("tier rollups of repaired == correct-then-aggregate oracle, all 4 tiers") {
    def tiers(df: DataFrame) = Rollup.allTiers(
      df.withColumn("domain", PageGen.domainOf("url")),
      Seq("domain"),
      "warc_ts",
      length(col("html")).cast("long"),
      langCol = Some("lang")
    )
    val got = tiers(repaired)
    val want = tiers(clean)
    for (t <- Seq("1m", "1h", "1d", "30d")) {
      val g = mapFree(got(t))
      val w = mapFree(want(t))
      assert(g.except(w).isEmpty && w.except(g).isEmpty, s"tier $t mismatch")
    }
    // 30d tier really has >= 2 buckets (35-day span)
    assert(want("30d").select("bucket_ts").distinct().count() >= 2)
  }

  test("generator is parallelism-invariant (seed-stable)") {
    import graft.spark.Sessions
    val a = PageGen.clean(spark, 500L).repartition(1)
    val b = PageGen.clean(spark, 500L).repartition(7)
    val ca = comparable(a)
    val cb = comparable(b)
    assert(ca.except(cb).isEmpty && cb.except(ca).isEmpty)
  }

  test("detection finds exactly the corrupted cells on this fixture") {
    val detected = PagePipeline.detectErrors(dirty)
    val actual = Cells.cellDiff(
      PageGen.withRowId(dirty).withColumn("warc_ts", col("warc_ts").cast("string")),
      PageGen.withRowId(clean).withColumn("warc_ts", col("warc_ts").cast("string")),
      "row_id",
      Seq("warc_ts", "text", "lang")
    )
    val d = detected.select("row_id", "col")
    val a = actual.select("row_id", "col")
    assert(d.except(a).isEmpty, "false positives")
    assert(a.except(d).isEmpty, "missed errors")
  }

  test("incremental model + file-pruned updates == one-shot repair rollup, exactly") {
    import graft.snapshot.{ContinuousRollup, SnapshotStore}
    val base = java.nio.file.Files.createTempDirectory("pages_incr").toString
    val root = s"$base/src"
    val tiers = s"$base/tiers"
    // batch 2 is a crawl of the LAST few days only: its corrupted
    // timestamps (epoch-0 sentinels) repair back into that window, so
    // the second update recomputes only recent partitions
    val b1 = PageGen.corrupt(clean.filter(col("warc_ts") < "2024-02-01"))
    val b2 = PageGen.corrupt(clean.filter(col("warc_ts") >= "2024-02-01"))

    def upd(): Long = {
      val from = ContinuousRollup.lastApplied(tiers)
      val to = SnapshotStore.currentSnapshotId(root)
      val model = PageModel.update(spark, root, tiers, from, to)
      ContinuousRollup.update(
        spark, root, tiers, Seq("domain", "lang"), "warc_ts",
        length(col("html")).cast("long"),
        prepare = df => PagePipeline.repairWithCounts(df, model).withColumn("domain", PageGen.domainOf("url"))
      )
    }
    SnapshotStore.append(root, b1, tsCol = Some("warc_ts"))
    upd()
    SnapshotStore.append(root, b2, tsCol = Some("warc_ts"))
    upd()

    // the second update pruned: days 01-01..01-16 (previous 30d
    // window, untouched by a February crawl) were never opened
    val m = graft.snapshot.ContinuousRollup
      .readMetrics(spark, tiers)
      .filter(col("applied_snapshot") === 2)
      .head()
    assert(
      m.getAs[Int]("source_dirs_read") < m.getAs[Int]("source_dirs_total"),
      s"expected pruning: ${m.getAs[Int]("source_dirs_read")}/${m.getAs[Int]("source_dirs_total")}"
    )

    // bit-exact vs the one-shot repair-then-rollup of the full table
    val oneShot = PagePipeline.repair(dirty).withColumn("domain", PageGen.domainOf("url"))
    for (t <- Seq("1h", "1d", "30d")) {
      val got = ContinuousRollup.readTier(spark, tiers, t)
      val want = Rollup.fromRaw(oneShot, Seq("domain", "lang"), "warc_ts", t, length(col("html")).cast("long"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty, s"tier $t mismatch")
    }
  }
}
