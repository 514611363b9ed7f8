package graft.correct

import graft.SparkSpec
import graft.sources.StringCsv

/** E2E F1 parity on the reference's RENUVER block
  * (`/root/reference/datasets/renuver/{bridges,cars,glass,restaurant}`,
  * dirty variants `<name>_<ef>_<version>.csv`, positional row ids) and
  * rayyan — the remaining published quality figures from
  * BASELINE.md:17-23 (ensemble incl. GPT members, budget 20):
  *
  *   bridges 1.000 (ef1) / 0.887 (ef3), cars 0.968 / 0.921,
  *   glass 0.819 / 0.685, restaurant 0.629 / 0.524, rayyan 0.822.
  *
  * Protocol: perfect detection, W2 Baran 20-tuple budget, full
  * deterministic ensemble + frozen pseudo-LLM cache; decision = A13 or
  * per-column meta-learner, chosen per dataset (the reference runs the
  * same per-dataset model selection through `hpo.py` /
  * CLASSIFICATION_MODEL). Measured round-3 (full table incl. the
  * non-chosen config in BASELINE.md "Reference-dataset F1 parity"):
  *
  *   bridges (A13)  1.000 / 0.905 — both >= the reference
  *   cars    (meta ef1, A13 ef3) 0.976 / 0.860 — ef1 beats 0.968
  *   glass   (meta) 0.886 / 0.686 — both >= the reference
  *   restaurant (A13) 0.462 / 0.394 — below 0.629/0.524: the
  *     reference's LLM answers these from world knowledge (city from
  *     the phone's area code) and cross-row entity matching; honest gap
  *   rayyan  (meta) 0.918 — ABOVE the reference's 0.822
  */
class RenuverDatasetsSpec extends SparkSpec {

  private val root = "/root/reference/datasets"

  private def renuver(name: String, ef: Int, meta: Boolean, version: Int = 1): EnsembleHarness.Result = {
    val dirty = StringCsv.readIndexed(spark, s"$root/renuver/$name/${name}_${ef}_$version.csv")
    val clean = StringCsv.readIndexed(spark, s"$root/renuver/$name/clean.csv")
    val cols = dirty.columns.filterNot(_ == "row_id").toSeq
    val r = EnsembleHarness.run(dirty, clean, cols, metaLearner = meta)
    info(f"$name ef=$ef v$version meta=$meta F1=${r.f1}%.3f P=${r.precision}%.3f R=${r.recall}%.3f")
    r
  }

  test("bridges matches (ef=1) and beats (ef=3) the reference") {
    assert(renuver("bridges", 1, meta = false).f1 >= 0.99)
    assert(renuver("bridges", 3, meta = false).f1 >= 0.887) // reference figure
  }

  test("cars beats the reference at ef=1; pinned at ef=3") {
    assert(renuver("cars", 1, meta = true).f1 >= 0.968) // reference figure
    assert(renuver("cars", 3, meta = false).f1 >= 0.84)
  }

  test("glass beats the reference at both error fractions") {
    assert(renuver("glass", 1, meta = true).f1 >= 0.819) // reference figure
    assert(renuver("glass", 3, meta = true).f1 >= 0.685) // reference figure
  }

  test("restaurant: entity corrector + meta-learner close most of the llm_master gap") {
    // ef=1: the cross-row entity/token corrector (area-code -> city
    // conditionals, duplicate-record carry) + per-column meta-learner
    // reaches 0.558 (reference 0.629, its remainder is GPT world
    // knowledge); ef=3 keeps the A13 decision (meta measured 0.400
    // there) — the same per-dataset model selection the reference runs
    assert(renuver("restaurant", 1, meta = true).f1 >= 0.55)
    assert(renuver("restaurant", 3, meta = false).f1 >= 0.39)
  }

  test("rayyan beats the reference") {
    val dirty = StringCsv.readIndexed(spark, s"$root/rayyan/dirty.csv")
    val clean = StringCsv.readIndexed(spark, s"$root/rayyan/clean.csv")
    val cols = dirty.columns.filterNot(_ == "row_id").toSeq
    val r = EnsembleHarness.run(dirty, clean, cols, metaLearner = true)
    info(f"rayyan meta F1=${r.f1}%.3f P=${r.precision}%.3f R=${r.recall}%.3f")
    // measured 0.918 — ABOVE the reference's published 0.822
    assert(r.f1 >= 0.822)
  }
}
