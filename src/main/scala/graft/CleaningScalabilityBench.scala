package graft

import graft.correct._
import graft.spark.Sessions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's scalability experiment (BASELINE.md: ncvoters, 19
  * string columns, simple_mcar ef=2, runtimes 1017 s @ 5k rows to
  * 1945 s @ 25k rows single-node) re-run against this engine: a
  * deterministic ncvoters-shaped table (19 columns, zip->city/state
  * FDs, 2% MCAR cell corruption), perfect detection, 20-tuple Baran
  * budget, the full deterministic ensemble. Prints one JSON line per
  * row count; results recorded in BASELINE.md.
  */
object CleaningScalabilityBench {

  /** ncvoters-shaped synthetic table (FIXTURES.md §3 archetype). */
  def voters(spark: SparkSession, n: Long): DataFrame = {
    val h = xxhash64(col("id"), lit(7))
    def pick(seed: Int, vals: Seq[String]) =
      element_at(array(vals.map(lit): _*), (pmod(xxhash64(col("id"), lit(seed)), lit(vals.size.toLong)) + 1).cast("int"))
    val zip = concat(lit("2"), pmod(h, lit(70L)) + 100) // 70 zips
    spark
      .range(n)
      .select(
        col("id").as("row_id"),
        concat(lit("fn"), pmod(h, lit(997L))).as("first_name"),
        concat(lit("mn"), pmod(h, lit(97L))).as("middle_name"),
        concat(lit("ln"), pmod(h, lit(797L))).as("last_name"),
        (pmod(h, lit(70L)) + 18).cast("string").as("age"),
        pick(11, Seq("m", "f", "u")).as("gender"),
        pick(12, Seq("w", "b", "a", "i", "o")).as("race"),
        pick(13, Seq("dem", "rep", "una", "lib")).as("party"),
        concat(pmod(h, lit(9999L)), lit(" main st")).as("street_address"),
        // zip functionally determines city and state: the FDs the
        // corrector ensemble exploits (ncvoters' zip_code -> res_city)
        zip.as("zip_code"),
        concat(lit("city"), zip).as("city"),
        concat(lit("st"), pmod(zip.cast("long"), lit(5L))).as("state"),
        concat(lit("area"), pmod(h, lit(30L))).as("area_code"),
        concat(lit("ph"), pmod(h, lit(9999L))).as("phone_number"),
        pick(14, Seq("active", "inactive", "denied")).as("status"),
        concat(lit("p"), pmod(h, lit(20L))).as("precinct"),
        concat(lit("m"), pmod(h, lit(12L))).as("municipality"),
        concat(lit("w"), pmod(h, lit(8L))).as("ward"),
        concat(lit("d"), pmod(h, lit(13L))).as("district")
      )
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.build(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]", "cleaning-scale")
    spark.sparkContext.setLogLevel("ERROR")
    val cols = voters(spark, 1).columns.filterNot(_ == "row_id").toSeq

    val rowCounts = sys.env
      .get("SPARK_GRAFT_SCALE_ROWS")
      .map(_.split(",").toSeq.map(_.trim.toLong))
      .getOrElse(Seq(5000L, 10000L, 25000L))
    for (n <- rowCounts) {
      val clean = voters(spark, n).cache()
      // simple_mcar ef=2: ~2% of cells blanked, spread over all columns
      val dirty = cols.foldLeft(clean) { (df, c) =>
        df.withColumn(c, when(pmod(xxhash64(col("row_id"), lit(c)), lit(100L)) < 2, lit("")).otherwise(col(c)))
      }
      val diff = Cells.cellDiff(dirty, clean, "row_id", cols).cache()
      val detected = diff.select(col("row_id"), col("col"), col("dirty_value").as("error_value"))
      val actual = diff.select(col("row_id"), col("col"), col("clean_value"))
      val rows = Correctors.baranSample(detected, 20)
      val labels = actual.filter(col("row_id").isin(rows: _*))

      val t0 = System.nanoTime()
      val corrections =
        Cleaning.run(dirty, "row_id", cols, detected, labels, CleaningConfig(usePdepVicinity = true))
      val m = Correctors.evaluate(corrections, actual)
      val sec = (System.nanoTime() - t0) / 1e9
      println(
        f"""{"metric":"cleaning_scalability","rows":$n,"n_errors":${detected.count()},"seconds":$sec%.1f,"ec_f":${m("ec_f")}%.4f,"rows_per_sec":${n / sec}%.0f}"""
      )
      clean.unpersist(); diff.unpersist()
    }
    spark.stop()
  }
}
