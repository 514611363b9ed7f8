package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-mix temperature reweighting — the data-mixing step of an
  * LLM pipeline: strata (languages, sources, quality bins) are
  * sampled with probability ∝ (stratum tokens)^α, α < 1 boosting the
  * tail (multilingual sampling à la XLM-R); the derived
  * expected-epochs column says how often a stratum's data repeats
  * under a token budget — the over-sampling diagnostic reviewers of a
  * mix read first.
  *
  * α is fixed at 0.5: `sqrt` is correctly rounded in every IEEE
  * engine, so the whole computation stays ORACLE-EXACT (a general
  * `pow(x, α)` carries last-ulp license and would break cross-engine
  * hashes). The only cross-stratum reduce, the normalization
  * denominator, runs on floor-scaled INTEGER micro-units —
  * summation-order-free where a double sum would drift with
  * partitioning — and rides a 1-row broadcast cross-join, not a
  * driver action. One partial-aggregated shuffle on the stratum key;
  * the stratum relation is vocabulary-sized.
  */
object Mixture {

  /** @return (group, group_tokens, weight, epochs): sampling weight
    *         ∝ sqrt(group_tokens), normalized; epochs = expected
    *         repeats of the group's data when drawing `budgetTokens`.
    */
  def temperatureWeights(
      df: DataFrame,
      groupCol: String,
      tokensCol: String,
      budgetTokens: Long
  ): DataFrame = {
    val perGroup = df
      .groupBy(col(groupCol))
      .agg(sum(col(tokensCol)).cast("long").as("group_tokens"))
      .withColumn("__s", floor(sqrt(col("group_tokens")) * lit(1000000.0)).cast("long"))
    perGroup
      .crossJoin(broadcast(perGroup.agg(sum(col("__s")).as("__d"))))
      .select(
        col(groupCol),
        col("group_tokens"),
        (col("__s").cast("double") / col("__d").cast("double")).as("weight"),
        (lit(budgetTokens.toDouble) * col("__s") / col("__d") / col("group_tokens")).as("epochs"))
  }
}
