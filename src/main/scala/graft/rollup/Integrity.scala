package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingestion integrity check over a monotonically-keyed stream:
  * detect duplicated and dropped records by sequence id — the
  * first data-quality gate of every at-least-once pipeline (did the
  * replay duplicate? did the buffer drop?).
  *
  * Returns one row per anomaly: kind = 'dup' (at_id occurs n > 1
  * times) or 'gap' (n ids missing starting at at_id). All integer,
  * deterministic.
  *
  * Scale shape: duplicates are one partial-aggregated exchange keyed
  * by id; gaps are one range-partitioned sort + lag window over the
  * DISTINCT ids (Spark's window sort is a total order via range
  * exchange — no single-partition bottleneck; the distinct collapses
  * the input to one row per id before the sort).
  */
object Integrity {

  def sequenceAnomalies(df: DataFrame, idCol: String): DataFrame = {
    val ids = df.select(col(idCol).cast("long").as("id"))

    val dups = ids
      .groupBy("id")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select(lit("dup").as("kind"), col("id").as("at_id"), col("n"))

    val gaps = ids
      .distinct()
      .withColumn("prev", lag(col("id"), 1).over(Window.orderBy("id")))
      .filter(col("prev").isNotNull && col("id") - col("prev") > 1)
      .select(
        lit("gap").as("kind"),
        (col("prev") + 1).as("at_id"),
        (col("id") - col("prev") - 1).as("n")
      )

    dups.unionByName(gaps)
  }
}
