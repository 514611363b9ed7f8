package graft.operators

import graft.SparkSpec

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives; false positives bounded; words packed to m/64 rows") {
    val keys = (0L until 20L).map(Tuple1(_)).toDF("k")
    val filter = Bloom.build(keys, "k", m = 256, k = 3, salt = "t")
    assert(filter.count() <= 8) // 256 bits = 8 32-bit words

    val probe = (0L until 100L).map(Tuple1(_)).toDF("k")
    val got = Bloom
      .mightContain(probe, "k", filter, m = 256, k = 3, salt = "t")
      .collect()
      .map(r => r.getLong(0) -> r.getBoolean(1))
      .toMap
    // every built key must be maybe=true
    assert((0L until 20L).forall(got(_)))
    // non-members mostly rejected (fp rate at n=20,m=256,k=3 is ~2%)
    val fps = (20L until 100L).count(got(_))
    assert(fps < 20, s"$fps false positives out of 80 — hash layout broken")
  }

  test("deterministic across builds; salt changes the filter") {
    val keys = (0L until 10L).map(Tuple1(_)).toDF("k")
    def bits(salt: String) =
      Bloom.build(keys, "k", 256, 3, salt).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bits("a") == bits("a"))
    assert(bits("a") != bits("b"))
  }

  test("bad parameters rejected") {
    val df = Seq(Tuple1(1L)).toDF("k")
    intercept[IllegalArgumentException] { Bloom.build(df, "k", m = 100, k = 3, salt = "t") }
    intercept[IllegalArgumentException] { Bloom.build(df, "k", m = 16, k = 3, salt = "t") }
    intercept[IllegalArgumentException] { Bloom.build(df, "k", m = 256, k = 0, salt = "t") }
  }
}
