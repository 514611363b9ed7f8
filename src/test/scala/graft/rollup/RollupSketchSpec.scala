package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mergeable distinct sketches on the tier hierarchy: HLL union of
  * finer-tier sketches must equal sketching the raw rows directly
  * within sketch error, and the estimate must sit within HLL error of
  * the exact distinct count.
  */
class RollupSketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val raw = spark
    .range(20000)
    .select(
      concat(lit("s"), pmod(col("id"), lit(3))).as("series"),
      timestamp_seconds(lit(1704067200L) + col("id") * 7).as("ts"),
      pmod(xxhash64(col("id")), lit(997L)).as("user_id")
    )

  test("tier-merged HLL estimate tracks the direct sketch estimate") {
    // union of sub-sketches is NOT guaranteed bit-identical to direct
    // sketching (sparse->dense promotion differs), but the estimates
    // must agree within sketch error on every (series, day)
    val t1m = Rollup.fromRaw(raw, Seq("series"), "ts", "1m", lit(0L), sketches = Map("u" -> col("user_id")))
    val t1h = Rollup.reRollup(t1m, Seq("series"), "1m" -> "1h", sketchCols = Seq("u"))
    val t1d = Rollup.reRollup(t1h, Seq("series"), "1h" -> "1d", sketchCols = Seq("u"))
    val merged = t1d
      .select(col("series"), col("bucket_ts"), hll_sketch_estimate(col("u")).as("m_est"))
    val direct = Rollup
      .fromRaw(raw, Seq("series"), "ts", "1d", lit(0L), sketches = Map("u" -> col("user_id")))
      .select(col("series"), col("bucket_ts"), hll_sketch_estimate(col("u")).as("d_est"))
    val j = merged.join(direct, Seq("series", "bucket_ts")).collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      val m = r.getAs[Long]("m_est").toDouble
      val d = r.getAs[Long]("d_est").toDouble
      assert(math.abs(m - d) / d < 0.05, s"merged $m vs direct $d")
    }
  }

  test("sketches survive the lang-histogram path and its re-rollup") {
    val withLang = raw.withColumn("lang", concat(lit("l"), pmod(col("user_id"), lit(4))))
    val t1h = Rollup.fromRaw(
      withLang, Seq("series"), "ts", "1h", lit(0L),
      langCol = Some("lang"), sketches = Map("u" -> col("user_id"))
    )
    assert(t1h.columns.contains("u") && t1h.columns.contains("lang_hist"))
    val t1d = Rollup.reRollup(t1h, Seq("series"), "1h" -> "1d", sketchCols = Seq("u"))
    assert(t1d.columns.contains("u") && t1d.columns.contains("lang_hist"))
    val est = t1d.select(col("series"), col("bucket_ts"), hll_sketch_estimate(col("u")).as("est"))
    val exact = withLang
      .groupBy(col("series"), date_trunc("day", col("ts")).as("bucket_ts"))
      .agg(countDistinct("user_id").as("n"))
    val j = est.join(exact, Seq("series", "bucket_ts")).collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      val e = r.getAs[Long]("est").toDouble
      val n = r.getAs[Long]("n").toDouble
      assert(math.abs(e - n) / n < 0.05, s"est $e vs exact $n")
    }
  }

  test("estimate is within 5% of the exact distinct count") {
    val t1d = Rollup.fromRaw(raw, Seq("series"), "ts", "1d", lit(0L), sketches = Map("u" -> col("user_id")))
    val est = t1d
      .select(col("series"), col("bucket_ts"), hll_sketch_estimate(col("u")).as("est"))
    val exact = raw
      .groupBy(col("series"), date_trunc("day", col("ts")).as("bucket_ts"))
      .agg(countDistinct("user_id").as("n"))
    val j = est.join(exact, Seq("series", "bucket_ts")).collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      val e = r.getAs[Long]("est").toDouble
      val n = r.getAs[Long]("n").toDouble
      assert(math.abs(e - n) / n < 0.05, s"est $e vs exact $n")
    }
  }
}
