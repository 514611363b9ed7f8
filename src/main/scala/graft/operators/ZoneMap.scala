package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Zone-map (data-skipping index) builder over the [[ZOrder]] layout:
  * per z-prefix zone, the min/max/count stats a scan planner prunes
  * with. This is the payoff step of z-ordering — because the layout
  * clusters BOTH dimensions, each zone's [min, max] envelope per
  * column is narrow, and a predicate on either column eliminates most
  * zones without reading them. The stats themselves are what
  * parquet/Iceberg keep per file/row-group; building them explicitly
  * makes the pruning power measurable (and testable) engine-side.
  *
  * Scale shape: one partial-aggregated exchange keyed by zone id
  * (bounded: 2^(2*prefixBits) zones); min/max/count are associative.
  */
object ZoneMap {

  /** @param prefixBits how many leading bits of EACH 16-bit dimension
    *                   hash form the zone id (zone id has 2*prefixBits
    *                   bits)
    * @return one row per occupied zone: (zone, n_rows, plus
    *         min_/max_ per requested stat column)
    */
  def stats(
      df: DataFrame,
      colA: String,
      colB: String,
      statCols: Seq[String],
      prefixBits: Int = 6,
      saltA: String = "za",
      saltB: String = "zb"
  ): DataFrame = {
    require(prefixBits >= 1 && prefixBits <= 16, s"prefixBits must be in [1,16], got $prefixBits")
    require(statCols.nonEmpty, "statCols must not be empty")
    val zone = shiftright(ZOrder.zKey(col(colA), saltA, col(colB), saltB), 32 - 2 * prefixBits)
    val aggs = count(lit(1)).as("n_rows") +:
      statCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(zone.as("zone")).agg(aggs.head, aggs.tail: _*)
  }
}
