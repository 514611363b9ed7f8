package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (1L to 4000L).toDF("id").cache()

  test("deterministic: same salt same rows across runs and partitionings") {
    val a = Sampling.sampleBy(ids, "id", 0.3, "s1").collect().map(_.getLong(0)).toSet
    val b = Sampling.sampleBy(ids.repartition(7), "id", 0.3, "s1").collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }

  test("fraction is monotone (nested samples) and roughly proportional") {
    val p10 = Sampling.sampleBy(ids, "id", 0.1, "s1").collect().map(_.getLong(0)).toSet
    val p30 = Sampling.sampleBy(ids, "id", 0.3, "s1").collect().map(_.getLong(0)).toSet
    assert(p10.subsetOf(p30))
    assert(math.abs(p10.size - 400) < 120 && math.abs(p30.size - 1200) < 200)
  }

  test("different salts draw (near-)independent samples") {
    val a = Sampling.sampleBy(ids, "id", 0.3, "s1").collect().map(_.getLong(0)).toSet
    val c = Sampling.sampleBy(ids, "id", 0.3, "s2").collect().map(_.getLong(0)).toSet
    assert(a != c)
    val overlap = a.intersect(c).size.toDouble / 4000
    assert(overlap > 0.03 && overlap < 0.16) // ~0.09 expected
  }

  test("stratified: per-stratum fractions with a default") {
    val df = ids.withColumn("lang", when(col("id") % 2 === 0, "en").otherwise("de"))
    val got = Sampling
      .stratifiedSampleBy(df, "id", "lang", Map("en" -> 0.05), defaultFraction = 0.5, salt = "s1")
      .groupBy("lang")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(got("en") < 200 && got("de") > 800)
  }

  test("edge fractions: 0 keeps nothing, 1 keeps everything") {
    assert(Sampling.sampleBy(ids, "id", 0.0, "s1").count() == 0L)
    assert(Sampling.sampleBy(ids, "id", 1.0, "s1").count() == 4000L)
  }
}
