package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise audience overlap per time bucket: for every pair of
  * segments (event types, cohorts, experiments), how many distinct
  * members did both — the intersection/Jaccard query behind audience
  * analysis and dedup between cohorts.
  *
  * Shape: distinct (bucket, segment, member) first (one partial-
  * aggregated exchange that collapses repeat activity), then a
  * member-keyed self-join — the wire carries one row per member-
  * segment, never raw events, and within one (bucket, member) the
  * fan-out is the member's segment count squared, bounded by the
  * segment vocabulary, not by data volume. Counts are exact integers
  * (hash-exact); at extreme segment counts the same frame plugs into
  * the HLL tier sketches instead (see RollupSketch) — this operator is
  * the exact path.
  */
object Overlap {

  /** @return (bucket_ts, seg_a, seg_b, n_a, n_b, n_both, jaccard) for
    *         seg_a < seg_b; jaccard = n_both / (n_a + n_b - n_both),
    *         one double division over exact integers.
    */
  def pairwise(
      df: DataFrame,
      segCol: String,
      memberCol: String,
      tsCol: String,
      bucket: String): DataFrame = {
    val members = df
      .select(
        date_trunc(bucket, col(tsCol)).as("bucket_ts"),
        col(segCol).as("seg"),
        col(memberCol).as("member"))
      .distinct()
    val sizes = members.groupBy("bucket_ts", "seg").agg(count(lit(1)).as("n"))
    val a = members.select(col("bucket_ts"), col("seg").as("seg_a"), col("member"))
    val b = members.select(col("bucket_ts"), col("seg").as("seg_b"), col("member"))
    val both = a
      .join(b, Seq("bucket_ts", "member"))
      .filter(col("seg_a") < col("seg_b"))
      .groupBy("bucket_ts", "seg_a", "seg_b")
      .agg(count(lit(1)).as("n_both"))
    both
      .join(
        sizes.select(col("bucket_ts"), col("seg").as("seg_a"), col("n").as("n_a")),
        Seq("bucket_ts", "seg_a"))
      .join(
        sizes.select(col("bucket_ts"), col("seg").as("seg_b"), col("n").as("n_b")),
        Seq("bucket_ts", "seg_b"))
      .select(
        col("bucket_ts"),
        col("seg_a"),
        col("seg_b"),
        col("n_a"),
        col("n_b"),
        col("n_both"),
        (col("n_both").cast("double") /
          (col("n_a") + col("n_b") - col("n_both")).cast("double")).as("jaccard"))
  }

  /** The sketch twin of [[pairwise]] for extreme member cardinality:
    * one HLL sketch per (bucket, segment), intersections by
    * inclusion-exclusion (|A∩B| = |A| + |B| − |A∪B|) over pairwise
    * sketch unions.
    *
    * Scale shape: the only member-sized work is the sketch aggregation
    * (one partial-aggregated exchange); the pair join runs on the
    * AGGREGATED relation — #buckets × #segments rows of fixed-size
    * sketch bytes, independent of member cardinality — where the exact
    * path's member-keyed self-join ships one wire row per
    * member-segment. Below the sketch's exact-mode threshold
    * (list/set mode) estimates equal true distinct counts, so the
    * output matches [[pairwise]] exactly — the property the q142
    * oracle pins; above it, standard HLL error (~1.6% at lgK=12).
    */
  def pairwiseSketch(
      df: DataFrame,
      segCol: String,
      memberCol: String,
      tsCol: String,
      bucket: String): DataFrame = {
    val sk = df
      .select(
        date_trunc(bucket, col(tsCol)).as("bucket_ts"),
        col(segCol).as("seg"),
        col(memberCol).as("member"))
      .groupBy("bucket_ts", "seg")
      .agg(hll_sketch_agg(col("member")).as("sk"))
      .withColumn("n", hll_sketch_estimate(col("sk")))
    val a = sk.select(col("bucket_ts"), col("seg").as("seg_a"), col("sk").as("sk_a"), col("n").as("n_a"))
    val b = sk.select(col("bucket_ts"), col("seg").as("seg_b"), col("sk").as("sk_b"), col("n").as("n_b"))
    a.join(b, Seq("bucket_ts"))
      .filter(col("seg_a") < col("seg_b"))
      .withColumn(
        "n_both",
        col("n_a") + col("n_b") - hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b"))))
      .filter(col("n_both") > 0)
      .select(
        col("bucket_ts"),
        col("seg_a"),
        col("seg_b"),
        col("n_a"),
        col("n_b"),
        col("n_both"),
        (col("n_both").cast("double") /
          (col("n_a") + col("n_b") - col("n_both")).cast("double")).as("jaccard"))
  }
}
