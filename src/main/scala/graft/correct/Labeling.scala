package graft.correct

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-labeling simulation (reference `label_with_ground_truth`,
  * `src/correction.py:354-388`): labeling a tuple reveals the clean
  * value of every cell in it — except that with probability
  * `noisePct` the "user" slips and enters a different value of the
  * column instead (defective user input).
  *
  * Determinism recast (SURVEY.md §7): the reference draws with
  * `random.random()` / `.sample()`; here the slip decision is an
  * md5-derived hash of (row, col, seed) — portable integer
  * arithmetic any engine reproduces — and the slip value is the NEXT
  * distinct column value in sort order after the truth (cyclic),
  * instead of a random other value. Columns with a single distinct
  * value keep the truth, like the reference's empty-candidates case.
  */
object Labeling {

  def labelWithGroundTruth(
      clean: DataFrame,
      rowId: String,
      cols: Seq[String],
      rows: Seq[Long],
      noisePct: Double = 0.0,
      seed: Long = 42L
  ): DataFrame = {
    val cells = Cells
      .melt(clean, rowId, cols)
      .filter(col("row_id").isin(rows: _*))
    if (noisePct <= 0)
      return cells.select(col("row_id"), col("col"), col("value").as("clean_value"))

    // distinct values per column with a cyclic successor
    val w = Window.partitionBy("col").orderBy("value")
    val dvals = Cells
      .melt(clean, rowId, cols)
      .select("col", "value")
      .distinct()
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("col")))
    val succ = dvals
      .select(col("col"), col("value"), col("rk"), col("n"))
      .join(
        dvals.select(col("col"), col("value").as("next_value"), col("rk").as("next_rk")),
        Seq("col")
      )
      .filter(col("next_rk") === pmod(col("rk"), col("n")) + 1)
      .select(col("col"), col("value"), col("next_value"), col("n"))

    val slip = pmod(
      expr(s"cast(conv(substring(md5(concat(row_id, '|', col, '|', $seed)), 1, 15), 16, 10) as bigint)"),
      lit(10000L)
    ) < lit((noisePct * 10000).toLong)

    cells
      .join(broadcast(succ), Seq("col", "value"), "left") // null values never match but must keep their label row
      .select(
        col("row_id"),
        col("col"),
        when(slip && col("n") > 1 && col("next_value").isNotNull, col("next_value"))
          .otherwise(col("value"))
          .as("clean_value")
      )
  }
}
