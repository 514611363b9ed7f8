package graft.correct

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S8 deterministic error injectors (reference `datasets/helpers.py:
  * 26-116`, mechanisms MCAR / MAR / MNAR), re-derived as seed-stable
  * Catalyst expressions: the corrupted cell set is a pure function of
  * (key column, seed, fraction), identical at any parallelism level —
  * the property every corruption-oracle query in SparkEntry relies on.
  *
  *  - MCAR: completely at random — hit iff hash(key, seed) falls in
  *    the fraction band;
  *  - MAR: at random conditioned on ANOTHER observed column — only
  *    rows whose `condCol` hash falls in the top half are eligible,
  *    at double rate (keeps the expected fraction);
  *  - MNAR: not at random — eligibility depends on the corrupted
  *    column's OWN value (its hash band), i.e. missingness correlates
  *    with the value itself.
  */
object Corrupt {

  private def band(c: Column, seed: Int): Column =
    pmod(xxhash64(c, lit(seed)), lit(10000L))

  private def hit(keyCol: Column, seed: Int, fraction: Double): Column =
    band(keyCol, seed) < lit((fraction * 10000).toLong)

  def mcar(df: DataFrame, targetCol: String, keyCol: String, corrupted: Column, fraction: Double, seed: Int = 1): DataFrame =
    df.withColumn(targetCol, when(hit(col(keyCol), seed, fraction), corrupted).otherwise(col(targetCol)))

  def mar(
      df: DataFrame,
      targetCol: String,
      keyCol: String,
      condCol: String,
      corrupted: Column,
      fraction: Double,
      seed: Int = 2
  ): DataFrame = {
    val eligible = band(col(condCol), seed + 100) >= 5000
    df.withColumn(
      targetCol,
      when(eligible && hit(col(keyCol), seed, fraction * 2), corrupted).otherwise(col(targetCol))
    )
  }

  def mnar(df: DataFrame, targetCol: String, keyCol: String, corrupted: Column, fraction: Double, seed: Int = 3): DataFrame = {
    val eligible = band(col(targetCol), seed + 100) >= 5000
    df.withColumn(
      targetCol,
      when(eligible && hit(col(keyCol), seed, fraction * 2), corrupted).otherwise(col(targetCol))
    )
  }
}
