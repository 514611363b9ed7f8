package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: per member, the first time each stage was
  * reached IN ORDER — a stage-k event counts only if some qualifying
  * stage-(k-1) event happened strictly earlier in the (ts, tieBreak)
  * total order. The product-analytics "view → click → purchase
  * conversion" query.
  *
  * Implementation: a chain of `min(case qualifying_k then ts) over
  * (member, preceding rows)` windows — every window shares one
  * partition/order spec, so Catalyst plans ONE exchange + sort for the
  * whole chain, then a per-member partial-aggregated reduce. No joins,
  * no per-stage passes over the data.
  *
  * Everything is timestamp/boolean arithmetic — hash-exact; the oracle
  * replays the identical window chain.
  */
object Funnel {

  /** @return (member, t_<stage>... , stages_completed); `t_<stage>` is
    *         the first in-order time the stage was reached (NULL if
    *         never), and non-null stage times always form a prefix.
    */
  def ordered(
      df: DataFrame,
      memberCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String],
      tieBreak: String): DataFrame = {
    require(stages.size >= 2, s"a funnel needs at least 2 stages, got ${stages.size}")
    require(stages.distinct.size == stages.size, s"duplicate funnel stages: $stages")
    val before = Window
      .partitionBy(col(memberCol))
      .orderBy(col(tsCol), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, -1)
    var cur = df
      .select(col(memberCol), col(tsCol), col(tieBreak), col(typeCol))
      .withColumn("__q0", col(typeCol) === stages.head)
    for (i <- 1 until stages.size) {
      cur = cur
        .withColumn(s"__seen${i - 1}", min(when(col(s"__q${i - 1}"), col(tsCol))).over(before))
        .withColumn(s"__q$i", col(typeCol) === stages(i) && col(s"__seen${i - 1}").isNotNull)
    }
    val stageMins = stages.indices.map(i =>
      min(when(col(s"__q$i"), col(tsCol))).as(s"t_${stages(i)}"))
    val agged = cur.groupBy(col(memberCol)).agg(stageMins.head, stageMins.tail: _*)
    val completed = stages.indices
      .map(i => col(s"t_${stages(i)}").isNotNull.cast("long"))
      .reduce(_ + _)
    agged.withColumn("stages_completed", completed)
  }
}
