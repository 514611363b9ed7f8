package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention: members grouped by their first-activity bucket
  * (the cohort), counted by how many are still active N buckets later
  * — the "day-N retention" matrix behind every growth dashboard.
  *
  * Shape: distinct (member, bucket) first (collapses raw activity to
  * at most one row per member-bucket), a member-keyed aggregate for
  * the cohort assignment, a member-keyed join back (both sides already
  * clustered on the member), then a partial-aggregated count per
  * (cohort, offset). The matrix is tiny (#buckets²) regardless of
  * corpus size; everything is integer/date arithmetic — hash-exact.
  */
object Cohort {

  /** @return (cohort_ts, day_offset, n_members, cohort_size,
    *         retention) — retention = n_members / cohort_size, one
    *         double division over exact integers.
    */
  def retention(
      df: DataFrame,
      memberCol: String,
      tsCol: String,
      bucket: String = "day"): DataFrame = {
    val activity = df
      .select(col(memberCol).as("member"), date_trunc(bucket, col(tsCol)).as("activity_ts"))
      .distinct()
    val cohorts = activity.groupBy("member").agg(min(col("activity_ts")).as("cohort_ts"))
    val counts = activity
      .join(cohorts, Seq("member"))
      .groupBy(
        col("cohort_ts"),
        datediff(col("activity_ts"), col("cohort_ts")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_members"))
    val size = Window.partitionBy("cohort_ts")
    counts
      .withColumn("cohort_size", max(when(col("day_offset") === 0, col("n_members"))).over(size))
      .withColumn(
        "retention",
        col("n_members").cast("double") / col("cohort_size").cast("double"))
  }
}
