package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl politeness scheduling — the fetch-planner half of the
  * [[Robots]] gate: RFC 9309's `Crawl-delay` says a host may be hit
  * at most once per `delay` seconds, so a frontier of permitted URLs
  * becomes a per-host serialized schedule: order by priority, fetch
  * slot i at offset `i * delay`. The output (slot, offset) pair is
  * what a fetch fleet shards on — workers pull (host, slot) ranges
  * and the per-host rate cap holds globally without coordination.
  *
  * Scale shape: ONE window partitioned by host — the inherent
  * parallelism of politeness (hosts are independent; within a host
  * the schedule is definitionally sequential). Hot hosts with
  * millions of URLs sort within their partition only; there is no
  * global order and no driver involvement.
  */
object Politeness {

  /** @param priority higher fetches first; ties break on `tieBreak` asc
    * @param delaySec per-row host crawl delay (seconds)
    * @return input plus (slot, fetch_offset_s): slot = per-host fetch
    *         index (0-based), offset = slot * delay
    */
  def schedule(
      urls: DataFrame,
      hostCol: String,
      priority: Column,
      tieBreak: String,
      delaySec: Column
  ): DataFrame = {
    val w = Window.partitionBy(col(hostCol)).orderBy(priority.desc, col(tieBreak).asc)
    urls
      .withColumn("slot", (row_number().over(w) - 1).cast("long"))
      .withColumn("fetch_offset_s", col("slot") * delaySec.cast("long"))
  }
}
