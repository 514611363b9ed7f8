package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral transition matrix — first-order Markov counts over
  * per-entity event sequences: P(next state | current state) for
  * session analysis (view→purchase propensity, error→retry loops,
  * crawl status churn). The matrix is the input to funnel design and
  * to anomaly flags on transition drift.
  *
  * Scale shape: one window (partition by entity, order by time) for
  * the lag pairing — entity sequences sort independently — then a
  * partial-aggregated count on (from, to); the matrix relation is
  * |states|² rows, so the probability normalization window runs over
  * a vocabulary-sized relation, never the event stream.
  *
  * Determinism: ordering ties break on `tieBreak`; counts are exact
  * integers and `prob` is their one float division.
  */
object Transitions {

  /** @return (from_state, to_state, n, prob) with prob normalized per
    *         from_state row; an entity's first event has no
    *         predecessor and pairs with nothing.
    */
  def matrix(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieBreak: String,
      stateCol: String
  ): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol), col(tieBreak))
    val counts = df
      .select(lag(col(stateCol), 1).over(w).as("from_state"), col(stateCol).as("to_state"))
      .filter(col("from_state").isNotNull)
      .groupBy("from_state", "to_state")
      .agg(count(lit(1)).as("n"))
    val norm = Window.partitionBy(col("from_state"))
    counts.withColumn("prob", col("n").cast("double") / sum(col("n")).over(norm).cast("double"))
  }
}
