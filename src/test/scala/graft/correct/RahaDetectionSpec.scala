package graft.correct

import graft.SparkSpec
import graft.sources.{DetectionMasks, StringCsv}
import org.apache.spark.sql.functions._

/** Imperfect-detection mode with the reference's ACTUAL Raha masks
  * (`datasets/raha-detection-results/`, loader parity with
  * `src/dataset.py:213-234` — completes the S7 input side): cleaning
  * runs on what the detector flagged, evaluation stays against the
  * true cell diff, mirroring the reference's
  * `get_errors_dictionary('raha')` path.
  *
  * On beers the shipped mask (version 1) has detection P=0.997 /
  * R=1.000 against the shipped dirty.csv (verified: all 4362 true
  * error cells are inside the 4375-cell mask), so correction quality
  * should land near the perfect-detection figure; the 13 false
  * positives cost a little precision. Measured round-3:
  * perfect 0.926 vs raha 0.922 (A13 + pseudo-LLM cache).
  */
class RahaDetectionSpec extends SparkSpec {

  private val root = "/root/reference/datasets"

  test("beers: cleaning from the real raha mask lands near the perfect-detection figure") {
    val dirty = StringCsv.readIndexed(spark, s"$root/beers/dirty.csv")
    val clean = StringCsv.readIndexed(spark, s"$root/beers/clean.csv")
    // the mask's column index counts every CSV column incl. "index"
    val allCols = dirty.columns.filterNot(_ == "row_id").toSeq
    val raha = DetectionMasks
      .readRaha(spark, s"$root/raha-detection-results", "beers", 1L, dirty, "row_id", allCols)
      .filter(col("col") =!= "index")
      .cache()

    val cols = allCols.filterNot(_ == "index")
    val perfect = EnsembleHarness.run(dirty, clean, cols)
    val withRaha = EnsembleHarness.run(dirty, clean, cols, detectedOverride = Some(raha))
    info(f"beers perfect-detection F1=${perfect.f1}%.3f vs raha-detection F1=${withRaha.f1}%.3f")

    assert(withRaha.f1 >= 0.85)
    // near-perfect mask recall => at most a small correction-F1 gap
    assert(perfect.f1 - withRaha.f1 <= 0.05)
  }

  test("raha loader rejects ambiguous or missing mask selections") {
    val dirty = StringCsv.readIndexed(spark, s"$root/beers/dirty.csv")
    val allCols = dirty.columns.filterNot(_ == "row_id").toSeq
    intercept[IllegalArgumentException] {
      DetectionMasks.readRaha(spark, s"$root/raha-detection-results", "beers", 99L, dirty, "row_id", allCols)
    }
    // bridges needs error_fraction to disambiguate (ef 1 and 3 both have v1)
    intercept[IllegalArgumentException] {
      DetectionMasks.readRaha(spark, s"$root/raha-detection-results", "bridges", 1L, dirty, "row_id", allCols)
    }
  }
}
