package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Goldens produced by running the reference value-model semantics
  * (correction.py:148-219) in CPython on the same training pairs.
  */
class ValueModelSpec extends AnyFunSuite {
  private val models = ValueModels.fromPairs(Seq(
    ("Berln", "Berlin"), ("Potsdm", "Potsdam"), ("14193x", "14193"),
    ("Hamburg", "Hamburg!"), ("Berln", "Berlin")))

  private def nonEmpty(probe: String): Map[String, Map[String, Double]] =
    models.suggest(probe).filter(_._2.nonEmpty)

  test("exact identity + unicode match (Berln)") {
    assert(nonEmpty("Berln") == Map(
      "value_adder_identity" -> Map("Berlin" -> 1.0),
      "value_adder_unicode" -> Map("Berlin" -> 1.0),
      "value_swapper_identity" -> Map("Berlin" -> 1.0),
      "value_swapper_unicode" -> Map("Berlin" -> 1.0)))
  }

  test("no model hit -> empty (Frankfrt, Kiel)") {
    assert(nonEmpty("Frankfrt").isEmpty)
    assert(nonEmpty("Kiel").isEmpty)
  }

  test("unicode-encoding transfer (Mnchen gets Potsdm's adder)") {
    assert(nonEmpty("Mnchen") == Map(
      "value_adder_unicode" -> Map("Mnchean" -> 1.0),
      "value_swapper_unicode" -> Map("Potsdam" -> 1.0)))
  }

  test("remover transfer via unicode encoding (14880x)") {
    assert(nonEmpty("14880x") == Map(
      "value_remover_unicode" -> Map("14880" -> 1.0),
      "value_swapper_unicode" -> Map("14193" -> 1.0)))
  }
}
