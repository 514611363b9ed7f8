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
}
