package graft.correct

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TokensCorruptSpec extends SparkSpec {
  import spark.implicits._

  test("MV token codec round-trips and only touches the empty string") {
    val df = Seq("", "<MV>", "x").toDF("v")
    val enc = df.select(Tokens.mvEncode(col("v")).as("e")).as[String].collect()
    assert(enc.toSeq == Seq("<MV>", "<MV>", "x"))
    val rt = df.select(Tokens.mvDecode(Tokens.mvEncode(col("v"))).as("r")).as[String].collect()
    // decode(encode('')) == ''; a literal '<MV>' also decodes to '' —
    // matching the reference, which cannot distinguish them either
    assert(rt.toSeq == Seq("", "", "x"))
  }

  test("promptKey masks the error position") {
    val df = Seq(("a", "b", "c")).toDF("c1", "c2", "c3")
    val k = df.select(Tokens.promptKey(Seq(col("c1"), col("c2"), col("c3")), 1).as("k")).head().getString(0)
    assert(k == "a,<Error>,c")
  }

  test("logprobScore = exp(sum(logprobs))") {
    val df = Seq(Seq(-0.5, -1.0)).toDF("lp")
    val s = df.select(Tokens.logprobScore(col("lp")).as("s")).head().getDouble(0)
    assert(math.abs(s - math.exp(-1.5)) < 1e-12)
  }

  test("injectors corrupt a seed-stable fraction with the right mechanism") {
    val df = spark.range(10000).select(
      col("id"),
      concat(lit("v"), pmod(col("id"), lit(100))).as("target"),
      pmod(col("id"), lit(2)).cast("string").as("cond")
    )
    val mcar = Corrupt.mcar(df, "target", "id", lit("BAD"), 0.05)
    val nMcar = mcar.filter(col("target") === "BAD").count()
    assert(nMcar > 300 && nMcar < 700) // ~5% of 10k

    // deterministic across partitioning
    val nMcar2 = Corrupt
      .mcar(df.repartition(13), "target", "id", lit("BAD"), 0.05)
      .filter(col("target") === "BAD")
      .count()
    assert(nMcar == nMcar2)

    // MAR: corruption confined to rows whose cond-hash is eligible
    val mar = Corrupt.mar(df, "target", "id", "cond", lit("BAD"), 0.05)
    val marHit = mar.filter(col("target") === "BAD").select("cond").distinct().count()
    assert(marHit == 1) // only one of the two cond values is eligible

    // MNAR: corruption depends on the target value itself — the set of
    // corrupted source values is a strict subset of all values
    val mnarEligible = df
      .filter(pmod(xxhash64(col("target"), lit(103)), lit(10000L)) >= 5000)
      .select("target")
      .distinct()
      .count()
    assert(mnarEligible < 100 && mnarEligible > 0)
  }
}
