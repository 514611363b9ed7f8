package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance string similarity join (entity-resolution primitive):
  * all pairs within Levenshtein distance 1, found WITHOUT the O(n^2)
  * cross join via FastSS deletion-neighborhood signatures
  * (Bocek et al., "Fast Similarity Search in Large Dictionaries",
  * 2007 — public algorithm).
  *
  * Completeness: two strings s, t with lev(s,t) <= 1 always share a
  * signature from {s} ∪ del1(s) — equality shares s itself, a single
  * insertion/deletion means one side IS a deletion of the other, and a
  * substitution at position i means del_i(s) = del_i(t). Sharing a
  * signature only bounds the distance by 2 (e.g. "ab"/"ba" share "a"),
  * so candidates are verified with the exact `levenshtein` expression
  * — the signature join is a complete, never-lossy blocker.
  *
  * Scale shape: each string fans out to len+1 signature rows; the join
  * is keyed by signature (hash-partitioned, linear in corpus +
  * per-signature collisions), then a distinct on the candidate pair
  * and the codegen'd levenshtein verify. A signature shared by k
  * strings makes k^2 candidates, so degenerate inputs (millions of
  * equal-length near-identical ids) are capped with `maxSigDf` —
  * same guard family as the hot-shingle cap; pairs pruned by the cap
  * would all be verified anyway via their OTHER shared signatures
  * unless every shared signature is hot.
  */
object FuzzyJoin {

  /** All (id_a < id_b) pairs with levenshtein(str_a, str_b) <= 1.
    * Returns (id_a, id_b, str_a, str_b, dist).
    */
  def editDistance1Pairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxSigDf: Long = Long.MaxValue
  ): DataFrame = {
    val base = graft.spark.Spread
      .cpu(df)
      .select(col(idCol).cast("long").as("id"), col(strCol).as("str"))

    // {s} ∪ del1(s): index 0 = the string itself, index i >= 1 = s
    // with character i removed (substring concat, pure codegen)
    val sigs = base
      .select(
        col("id"),
        col("str"),
        explode(
          expr(
            """array_union(
                 array(str),
                 transform(sequence(1, length(str)),
                           i -> concat(substring(str, 1, i - 1), substring(str, i + 1))))"""
          )
        ).as("sig")
      )

    val pruned =
      if (maxSigDf == Long.MaxValue) sigs
      else {
        val hot = sigs
          .groupBy("sig")
          .agg(count(lit(1)).as("sdf"))
          .filter(col("sdf") > maxSigDf)
          .select("sig")
        sigs.join(hot, Seq("sig"), "left_anti")
      }

    val a = pruned.select(col("sig"), col("id").as("id_a"), col("str").as("str_a"))
    val b = pruned.select(col("sig"), col("id").as("id_b"), col("str").as("str_b"))

    a.join(b, Seq("sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "str_a", "str_b")
      .distinct()
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")))
      .filter(col("dist") <= 1)
  }
}
