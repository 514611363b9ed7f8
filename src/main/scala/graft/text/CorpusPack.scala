package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget corpus packing — the data-mixing step of a training
  * pipeline: from each stratum (language, source, domain bucket...),
  * take documents in quality order until that stratum's token budget
  * fills. Greedy-by-rank is the standard published recipe (quality
  * ranking + per-language budgets), and its prefix structure is what
  * makes it distributed-friendly: membership of a doc depends only on
  * the running token sum of better-ranked docs in ITS stratum — one
  * window cumsum per stratum (single hash exchange + in-partition
  * sort), no iteration, no driver state.
  *
  * Rule: keep a doc iff the cumulative token count INCLUDING it, in
  * (quality desc, tieBreak asc) order, is <= budget — the first doc
  * that would overflow the budget is dropped, as is everything after
  * it that doesn't fit; a doc smaller than the remaining gap but
  * ranked below an overflowing doc is still dropped (strict prefix —
  * deterministic and replayable, unlike bin-packing).
  *
  * Skew note: a stratum's docs serialize into one task's sort — at
  * 100 TB strata are languages/sources (dozens to thousands), and the
  * per-stratum data a sort sees is the doc METADATA (id, tokens,
  * quality), not text; a pathologically hot stratum shards by a salt
  * on the rank prefix upstream.
  */
object CorpusPack {

  /** Adds `cum_tokens` (inclusive running sum in selection order) and
    * keeps the budget prefix of each stratum.
    */
  def packByBudget(
      df: DataFrame,
      strataCol: String,
      tokensCol: String,
      qualityCol: String,
      tieBreak: String,
      budgets: Map[String, Long],
      defaultBudget: Long
  ): DataFrame = {
    (budgets.values.toSeq :+ defaultBudget).foreach(b => require(b >= 0, s"budget must be >= 0, got $b"))
    val w = Window
      .partitionBy(col(strataCol))
      .orderBy(col(qualityCol).desc, col(tieBreak).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budget = budgets.toSeq.sortBy(_._1).foldLeft(lit(defaultBudget)) {
      case (acc, (stratum, b)) => when(col(strataCol) === stratum, lit(b)).otherwise(acc)
    }
    df.withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .filter(col("cum_tokens") <= budget)
  }
}
