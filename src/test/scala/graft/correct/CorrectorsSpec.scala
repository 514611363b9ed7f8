package graft.correct

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** E2E corrector tests on the reference's debug fixtures
  * (`datasets/debug/` clean+dirty CSVs — 4-col animal table with '?'
  * errors; `datasets/toy/` — LOTR table with misspelled kingdoms),
  * FIXTURES.md §2.
  */
class CorrectorsSpec extends SparkSpec {
  import spark.implicits._

  // datasets/debug: dirty has Sagt='?' rows 2,4 and Tier='?' row 5
  private lazy val debugClean = Seq(
    (1L, "Hund", "Deutsch", "wau"),
    (2L, "Katze", "Deutsch", "miau"),
    (3L, "Kuh", "Deutsch", "muh"),
    (4L, "Hund", "Deutsch", "wau"),
    (5L, "Katze", "Deutsch", "miau"),
    (6L, "Katze", "Deutsch", "miau")
  ).toDF("row_id", "Tier", "Sprache", "Sagt")

  private lazy val debugDirty = Seq(
    (1L, "Hund", "Deutsch", "wau"),
    (2L, "Katze", "Deutsch", "?"),
    (3L, "Kuh", "Deutsch", "muh"),
    (4L, "Hund", "Deutsch", "?"),
    (5L, "?", "Deutsch", "miau"),
    (6L, "Katze", "Deutsch", "miau")
  ).toDF("row_id", "Tier", "Sprache", "Sagt")

  private val debugCols = Seq("Tier", "Sprache", "Sagt")

  test("perfect detection + fd/vicinity ensemble fully repairs the debug table") {
    val diff = Cells.cellDiff(debugDirty, debugClean, "row_id", debugCols)
    val errors = diff.select(col("row_id"), col("col"), col("dirty_value").as("error_value"))
    assert(errors.count() == 3)

    val fds = Seq(Fd(Seq("Tier"), "Sagt"), Fd(Seq("Sagt"), "Tier"))
    val gpdeps = Pdep.gpdepTable(debugDirty, errors, "row_id", fds)
    val fdSugg = Correctors.fdCorrector(debugDirty, errors, "row_id", gpdeps, fds)
    val vicSugg = Correctors.vicinityCorrectorOrder1(debugDirty, errors, "row_id", debugCols)
    val decided = Correctors.decide(fdSugg.unionByName(vicSugg))

    val actual = diff.select(col("row_id"), col("col"), col("clean_value"))
    val m = Correctors.evaluate(decided, actual)
    assert(m("ec_f") == 1.0, s"metrics were $m")

    val repaired = Cells.applyCorrections(debugDirty, decided, "row_id", debugCols)
    assert(repaired.except(debugClean).isEmpty && debugClean.except(repaired).isEmpty)
  }

  test("value corrector transfers misspelling fixes via unicode encoding (toy)") {
    // user labeled rows 7,8; errors remain at rows 9,10
    val errors = Seq(
      ErrorCell(9L, "Kingdom", "Riwendell"),
      ErrorCell(10L, "Kingdom", "Riendell")
    ).toDF()
    val labeled = Map("Kingdom" -> Seq("Riwendael" -> "Rivendell", "Riffendell" -> "Rivendell"))
    val sugg = Correctors.valueCorrector(errors, labeled)
    val row9 = sugg.filter(col("row_id") === 9 && col("candidate") === "Rivendell")
    assert(row9.count() > 0, "row 9 should receive the Rivendell suggestion")
  }

  test("frequency imputer suggests non-error column values with P5 filters") {
    val errors = Seq(ErrorCell(5L, "Tier", "?")).toDF()
    val sugg = Correctors.frequencyImputer(debugDirty, errors, "row_id", debugCols)
      .filter(col("col") === "Tier")
      .select("candidate")
      .as[String]
      .collect()
      .toSet
    // non-error Tier values: Hund x2, Katze x2, Kuh; '?' itself filtered out
    assert(sugg == Set("Hund", "Katze", "Kuh"))
  }

  test("user-label overlay wins over the decided correction") {
    val decided = Seq(Correction(2L, "Sagt", "wrong")).toDF()
    val user = Seq(Correction(2L, "Sagt", "miau")).toDF()
    val out = Correctors.overlayUserLabels(decided, user).collect()
    assert(out.length == 1 && out(0).getString(2) == "miau")
  }
}
