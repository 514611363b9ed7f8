package graft

import graft.pages.{PageGen, PagePipeline}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan shape assertions: the properties that keep the engine
  * fast at scale must be visible in the plan, not just hoped for —
  * filter/column pushdown into the parquet scan, broadcast joins for
  * model-sized relations, two-phase (partial+final) hash aggregation,
  * and whole-stage codegen over the hot expressions.
  */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** AQE only shows WholeStageCodegen spans in the FINAL plan — run
    * THIS queryExecution (collect, small fixtures) first, then render.
    */
  private def executedPhysical(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private lazy val pagesPath = {
    val p = "/tmp/graft_test_plan_pages"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
      PageGen.corrupt(PageGen.clean(spark, 5000)).write.mode("overwrite").parquet(p)
    p
  }

  test("parquet scan prunes columns and pushes filters") {
    val df = spark.read.parquet(pagesPath).filter(col("lang") === "en").select("url", "lang")
    val plan = physical(df)
    assert(plan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"), plan)
    // html/text/warc_ts must not be read for a url+lang projection
    assert(plan.contains("ReadSchema: struct<url:string,lang:string>"), plan)
  }

  test("repair pipeline broadcasts the model-sized relations") {
    val plan = physical(PagePipeline.repair(spark.read.parquet(pagesPath)))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("tier rollup is a two-phase hash aggregate (map-side partial)") {
    val df = graft.rollup.Rollup.fromRaw(
      spark.read.parquet(pagesPath).withColumn("domain", PageGen.domainOf("url")),
      Seq("domain"),
      "warc_ts",
      "1h",
      length(col("html")).cast("long")
    )
    val plan = physical(df)
    // partial + final HashAggregate pair around the exchange
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan)
    assert(executedPhysical(df).contains("*("))
  }

  test("bucketed similarity paths never fall back to a cartesian product") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = emb.filter(col("id") < 5).select(col("id").as("query_id"), col("embedding"))
    for (
      (name, df) <- Seq(
        "lshTopK" -> graft.ann.Ann.lshTopK(emb, q, k = 10),
        "nearDupLsh" -> graft.ann.Ann.cosineNearDupPairsLsh(emb, threshold = 0.4),
        "minHashLsh" -> graft.dedup.Dedup.minHashLsh(
          spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "doc_id", "text")
      )
    ) {
      val plan = physical(df)
      assert(!plan.contains("CartesianProduct"), s"$name plan degraded to a cartesian product: $plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name plan has a nested-loop join: $plan")
    }
  }

  test("pruned incremental update opens only the pruned snapshot files") {
    import graft.snapshot.{ContinuousRollup, SnapshotStore}
    val root = java.nio.file.Files.createTempDirectory("plan_prune").toString + "/src"
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    SnapshotStore.append(root, ev, tsCol = Some("ts"))
    // a reader restricted to two days must list exactly those leaf dirs
    val dirs = SnapshotStore.resolveDirs(root, 0L, 1L, Some(Set("2024-01-05", "2024-01-06")))
    assert(dirs.size == 2 && dirs.forall(_.contains("part_day=2024-01-0")))
    val scan = spark.read.parquet(dirs: _*)
    // every file the scan would open lives in a wanted leaf dir
    assert(scan.inputFiles.nonEmpty)
    assert(scan.inputFiles.forall(f => f.contains("part_day=2024-01-05") || f.contains("part_day=2024-01-06")))
  }

  test("no driver query degrades to a cartesian product; NLJ/SMJ only where intended") {
    // queries whose DataFrame CONSTRUCTION already executes heavy work
    // (lifecycle runs, snapshot updates, driver-side collects) are
    // audited by their own specs — the sweep covers the rest cheaply
    val skip = Set(
      "q25_pages_pipeline", "q37_continuous_rollup", "q44_baran_sample",
      "q45_meta_learner", "q48_cleaning", "q52_cleaning_synth", "q62_meta_learner_cv",
      "q182_meta_learner_cv_precision",
      "q53_detection_mask", "q54_label_noise",
      // construction runs a CSV write / snapshot update + compaction /
      // a full streaming query — audited by their own oracles + specs
      "q56_csv_roundtrip", "q57_compaction", "q58_streaming_blocks",
      "q61_experiment_grid",
      // construction runs a full streaming query (watermark+window
      // path) — audited by its oracle + StreamingRollupSpec
      "q124_streaming_tier",
      // construction runs full streaming queries (stream-stream join /
      // watermarked dedup / outer stream-stream join) — audited by
      // their oracles
      "q139_stream_stream_join", "q140_stream_dedup", "q169_stream_outer_join",
      // construction writes a snapshot store twice (q57-style side
      // effects) — audited by their oracles + SnapshotSpec
      "q137_time_travel", "q138_incremental_read", "q141_schema_evolution", "q144_row_deletes",
      // construction runs a snapshot update + archival retention
      "q146_retention_archive",
      // construction writes/vacuums/stages/rolls back a snapshot store
      "q147_vacuum", "q148_wap_publish", "q149_rollback",
      // construction forks/tags/appends snapshot stores (q166, q175)
      // and runs two incremental join-view updates (q167)
      "q166_branch_refs", "q167_join_view", "q175_branch_diff",
      // construction appends data + delete snapshots (q177)
      "q177_changelog"
    )
    // broadcast-model or tiny-side joins where a nested-loop is the
    // right plan: brute-force/centroid crosses (exactness baselines),
    // literal-column broadcast model lookups, single-row evaluation
    // q100: the as-of anchor is a 1-row broadcast cross join — a
    // nested loop against one row IS the right plan
    // q117/q123: the staleness/midpoint anchor is a 1-row broadcast
    // cross join, same shape as q100
    // q164: the normalization denominator is a 1-row broadcast cross
    // join against the vocabulary-sized stratum relation, same shape
    val allowNlj = Set(
      "q15_ann_brute", "q28_ann_ivf", "q63_ann_ivf_kmeans", "q66_ann_pq", "q69_ann_ivf_pq",
      "q35_embed_neardup", "q31_imputer", "q33_evaluate", "q100_decayed_topk",
      "q117_staleness", "q123_top_movers", "q164_mixture_weights"
    )
    // row_id-keyed apply/overlay joins: both sides scale with the
    // table, so a shuffle join IS the 100-TB plan (full-outer overlay
    // cannot broadcast at all)
    // q59: the token-df join and the token->trusted-cell join both have
    // data-sized sides (tokens scale with the corpus) — shuffle joins
    // ARE the 100-TB plan there; the reduced conditional model joins
    // back to error cells via AQE-chosen sides
    // q67: the exact-dedup digest join and the near-dup anti-join both
    // pair corpus-sized relations on a key — shuffle joins by design
    // q119: FULL OUTER bucket alignment cannot broadcast by definition;
    // both sides are tier-sized (pre-aggregated), so the sort-merge is
    // over bucket-count rows, not raw data
    // q134: FULL OUTER reconciliation join — cannot broadcast; both
    // sides are tier-sized aggregates
    // q158: the final auth⋈hub combine pairs two NODE-sized score
    // relations on the vertex key — at web-graph scale neither side
    // broadcasts, the shuffle join is the intended plan (the per-round
    // joins inside the iteration are checkpoint-materialized and don't
    // appear here)
    // q159: the wedge and closing joins pair the EDGE relation with
    // itself on edge keys — the all-pairs-within-neighborhood core of
    // triangle counting; at graph scale neither side broadcasts
    // q160: the final docs⋈levels combine pairs the vertex relation
    // with the visited-set relation — both node-sized, no broadcast
    // q170: FULL OUTER digest reconciliation — cannot broadcast; both
    // sides are partition-count-sized digest relations (q134's shape)
    // q172: the co-located bucketed join IS a sort-merge join — with
    // ZERO exchanges, which is the point (BucketingSpec pins that)
    val allowSmj = Set(
      "q07_correct_fd", "q32_user_overlay", "q59_entity_corrector", "q67_corpus_pipeline",
      "q119_series_ratio", "q134_tier_reconcile", "q158_hits", "q159_triangles",
      "q160_bfs_levels", "q170_replica_diff", "q172_bucketed_join"
    )
    val dir = "/root/testdata/sf0.001"
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1) if !skip.contains(name)) {
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name degraded to a cartesian product")
      if (plan.contains("BroadcastNestedLoopJoin"))
        assert(allowNlj.contains(name), s"$name grew an unexpected nested-loop join")
      if (plan.contains("SortMergeJoin"))
        assert(allowSmj.contains(name), s"$name grew an unexpected sort-merge join")
    }
  }

  test("correction decision stays whole-stage codegen'd") {
    val base = Seq((1L, "a", "x"), (2L, "a", "y")).toDF("row_id", "nation", "segment")
    val sugg = graft.correct.Correctors.vicinityCorrectorOrder1(
      base,
      Seq(graft.correct.ErrorCell(2L, "segment", "y")).toDF(),
      "row_id",
      Seq("nation", "segment")
    )
    assert(executedPhysical(sugg).contains("*("))
  }
}
