package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom filter as a RELATION: the pre-join pruning
  * structure a 100-TB engine ships to the probe side instead of the
  * build side's keys. The filter is (word_idx, bits) rows — m bits
  * packed into m/32 32-bit words (32, not 64: a bit 63 would be a
  * signed-overflow hazard in engines that check `1 << 63`), built with bitwise-OR aggregation — so it
  * broadcasts at a fixed size regardless of build cardinality, and the
  * probe is a broadcast join + bit tests, never a shuffle of the build
  * relation.
  *
  * All hashing is the repo's portable md5-prefix scheme (k independent
  * salted hashes mod m), so the filter contents — not just the
  * membership answers — are bit-identical in any engine; Spark's
  * internal `bloom_filter_agg` is deliberately NOT used (its layout is
  * engine-private, unreplayable by an oracle).
  *
  * Semantics: `maybe = true` for every present key (no false
  * negatives, by construction); false positives at the standard
  * (1 − e^(−kn/m))^k rate — callers follow with an exact verify join
  * on the survivors (the bloom's job is to shrink that join's input).
  *
  * Scale shape: build = one explode(k) + partial-aggregated bit_or
  * groupBy to m/32 rows; probe = k-row explode + broadcast join on
  * word_idx + one all-bits-set aggregate per probe key.
  */
object Bloom {

  private def hashPos(key: Column, j: Int, m: Int, salt: String): Column =
    pmod(
      conv(substring(md5(concat(key.cast("string"), lit(s"|$salt|$j"))), 1, 15), 16, 10)
        .cast("bigint"),
      lit(m.toLong)
    )

  private def checkArgs(m: Int, k: Int): Unit = {
    require(m >= 32 && m % 32 == 0, s"m must be a positive multiple of 32, got $m")
    require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")
  }

  /** Build the filter relation: (word_idx, bits), at most m/32 rows. */
  def build(df: DataFrame, keyCol: String, m: Int, k: Int, salt: String): DataFrame = {
    checkArgs(m, k)
    val positions = array((0 until k).map(j => hashPos(col(keyCol), j, m, salt)): _*)
    df.select(explode(positions).as("__pos"))
      .select(
        (col("__pos") / 32L).cast("long").as("word_idx"),
        pmod(col("__pos"), lit(32L)).cast("int").as("__bit")
      )
      .select(col("word_idx"), expr("shiftleft(1L, __bit)").as("__word"))
      .groupBy("word_idx")
      .agg(bit_or(col("__word")).as("bits"))
  }

  /** Probe keys against a built filter: input rows + `maybe` flag.
    * No false negatives; false positives at the configured rate.
    */
  def mightContain(
      probe: DataFrame,
      keyCol: String,
      filter: DataFrame,
      m: Int,
      k: Int,
      salt: String
  ): DataFrame = {
    checkArgs(m, k)
    val positions = array((0 until k).map(j => hashPos(col("__key"), j, m, salt)): _*)
    val exploded = probe
      .select(col(keyCol).as("__key"))
      .distinct()
      .select(col("__key"), explode(positions).as("__pos"))
      .select(
        col("__key"),
        (col("__pos") / 32L).cast("long").as("word_idx"),
        pmod(col("__pos"), lit(32L)).cast("int").as("__bit")
      )
    val hits = exploded
      .join(broadcast(filter), Seq("word_idx"), "left")
      .select(
        col("__key"),
        (coalesce(col("bits"), lit(0L)).bitwiseAND(expr("shiftleft(1L, __bit)")) =!= 0L)
          .as("__hit")
      )
      .groupBy("__key")
      .agg(min(when(col("__hit"), 1L).otherwise(0L)).as("__all_hit"))
      .select(col("__key"), (col("__all_hit") === 1L).as("maybe"))
    probe.join(broadcast(hits), probe(keyCol) === hits("__key"), "left").drop("__key")
  }
}
