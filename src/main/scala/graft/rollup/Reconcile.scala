package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier reconciliation: keyed diff of two aggregate tables that SHOULD
  * agree — recomputed-from-raw vs incrementally maintained, engine vs
  * backfill, before vs after a migration. Emits only disagreement
  * rows, labeled `missing_a` / `missing_b` / `mismatch`, with both
  * sides' measures attached; an empty result IS the reconciliation
  * certificate.
  *
  * Null-safe: measure comparison uses IS-DISTINCT-FROM semantics, so a
  * null on one side is a mismatch, null == null is agreement.
  *
  * Scale shape: one full-outer shuffle join on the tier key (both
  * inputs are tier-sized aggregates, not raw data); everything else is
  * row-local.
  */
object Reconcile {

  /** @return one row per disagreement: (keys..., a_<m>/b_<m> per
    *         measure, status)
    */
  def diff(
      a: DataFrame,
      b: DataFrame,
      keys: Seq[String],
      measures: Seq[String]
  ): DataFrame = {
    require(keys.nonEmpty && measures.nonEmpty, "keys and measures must not be empty")
    val la = a.select(
      keys.map(col) ++ measures.map(m => col(m).as(s"a_$m")) :+ lit(true).as("__in_a"): _*
    )
    val lb = b.select(
      keys.map(col) ++ measures.map(m => col(m).as(s"b_$m")) :+ lit(true).as("__in_b"): _*
    )
    val joined = la.join(lb, keys, "full_outer")
    val anyDiff = measures
      .map(m => not(col(s"a_$m") <=> col(s"b_$m")))
      .reduce(_ || _)
    joined
      .withColumn(
        "status",
        when(col("__in_a").isNull, lit("missing_a"))
          .when(col("__in_b").isNull, lit("missing_b"))
          .otherwise(lit("mismatch"))
      )
      .filter(col("__in_a").isNull || col("__in_b").isNull || anyDiff)
      .drop("__in_a", "__in_b")
  }
}
