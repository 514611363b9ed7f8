package graft.text

import graft.SparkSpec

/** Temperature-mix weighting goldens and invariants. */
class MixtureSpec extends SparkSpec {

  import spark.implicits._

  test("sqrt temperature boosts the tail; weights normalize; epochs follow the budget") {
    // 90/10 token split: plain proportional sampling gives the small
    // stratum 0.1; sqrt temperature lifts it to 1/4
    val df = Seq(("big", 900L), ("small", 100L)).toDF("lang", "n_tokens")
    val got = Mixture.temperatureWeights(df, "lang", "n_tokens", budgetTokens = 1000L)
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("big")._2 == 900L && got("small")._2 == 100L)
    assert(math.abs(got("big")._3 - 0.75) < 1e-9)
    assert(math.abs(got("small")._3 - 0.25) < 1e-9)
    // epochs: small stratum serves 250 of the 1000-token budget from
    // 100 tokens -> 2.5 passes; big serves 750 from 900 -> < 1 pass
    assert(math.abs(got("small")._4 - 2.5) < 1e-9)
    assert(math.abs(got("big")._4 - 750.0 / 900.0) < 1e-9)
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 1e-9)
  }

  test("partitioning does not change the weights (integer-denominator determinism)") {
    val df = (1 to 200).map(i => (s"l${i % 7}", i.toLong)).toDF("lang", "n_tokens")
    val a = Mixture.temperatureWeights(df, "lang", "n_tokens", 1000000L)
      .as[(String, Long, Double, Double)].collect().toSet
    val b = Mixture.temperatureWeights(df.repartition(13), "lang", "n_tokens", 1000000L)
      .as[(String, Long, Double, Double)].collect().toSet
    assert(a == b)
  }
}
