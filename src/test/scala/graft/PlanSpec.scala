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
