package graft.rollup

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable top-k (heavy hitters) sketch for the tier engine — the
  * "top domains per bucket" measure a 100-TB rollup needs where exact
  * per-item counts are too wide to keep.
  *
  * SpaceSaving (Metwally et al. 2005) with a deterministic twist:
  *  - update: counted items increment; a new item beyond `capacity`
  *    evicts the min-count item (ties -> lexicographically smallest)
  *    and inherits its count + 1;
  *  - merge: counter maps sum, then truncate to `capacity` by
  *    (count desc, item asc) — the mergeable-summaries construction
  *    (Agarwal et al. 2012), so coarser tiers re-aggregate the sketch
  *    exactly like counts or HLL states.
  *
  * Guarantees: any item with true frequency > N/capacity is present in
  * the sketch, and counts are exact as long as no state ever exceeds
  * `capacity` distinct items ("exact mode" — what the oracle-checked
  * driver query runs in). Above capacity the result is the standard
  * approximate summary: counts over-estimate by at most the evicted
  * minimum, and which boundary items survive depends on merge order
  * (inherent to every bounded-memory summary).
  */
object TopK {

  private type Counters = Map[String, Long]

  private def truncate(m: Counters, cap: Int): Counters =
    if (m.size <= cap) m
    else m.toSeq.sortBy { case (item, cnt) => (-cnt, item) }.take(cap).toMap

  private def mergeMaps(a: Counters, b: Counters, cap: Int): Counters = {
    val summed = b.foldLeft(a) { case (acc, (item, cnt)) =>
      acc.updated(item, acc.getOrElse(item, 0L) + cnt)
    }
    truncate(summed, cap)
  }

  private class SketchAgg(cap: Int) extends Aggregator[String, Counters, Counters] {
    def zero: Counters = Map.empty
    def reduce(b: Counters, item: String): Counters =
      if (item == null) b
      else
        b.get(item) match {
          case Some(c)               => b.updated(item, c + 1)
          case None if b.size < cap  => b.updated(item, 1L)
          case None =>
            val (evict, c) = b.minBy { case (i, cnt) => (cnt, i) }
            (b - evict).updated(item, c + 1)
        }
    def merge(a: Counters, b: Counters): Counters = mergeMaps(a, b, cap)
    def finish(r: Counters): Counters = r
    def bufferEncoder: Encoder[Counters] = ExpressionEncoder()
    def outputEncoder: Encoder[Counters] = ExpressionEncoder()
  }

  private class MergeAgg(cap: Int) extends Aggregator[Counters, Counters, Counters] {
    def zero: Counters = Map.empty
    def reduce(b: Counters, state: Counters): Counters =
      if (state == null) b else mergeMaps(b, state, cap)
    def merge(a: Counters, b: Counters): Counters = mergeMaps(a, b, cap)
    def finish(r: Counters): Counters = r
    def bufferEncoder: Encoder[Counters] = ExpressionEncoder()
    def outputEncoder: Encoder[Counters] = ExpressionEncoder()
  }

  /** Raw items -> sketch state (`map<string,bigint>`). */
  def sketch(item: Column, capacity: Int): Column =
    udaf(new SketchAgg(capacity), ExpressionEncoder[String]()).apply(item)

  /** Finer-tier sketch states -> coarser-tier state (the reRollup agg). */
  def mergeSketch(state: Column, capacity: Int): Column =
    udaf(new MergeAgg(capacity), ExpressionEncoder[Counters]()).apply(state)

  /** Presentation: the sketch's top `k` entries as "item:count" CSV,
    * ordered by (count desc, item asc) — built-in HOFs only, so the
    * stored state stays a plain map and any engine can re-rank it.
    */
  def present(state: Column, k: Int): Column = {
    val sorted = array_sort(
      map_entries(state),
      (l, r) =>
        when(l.getField("value") > r.getField("value"), -1)
          .when(l.getField("value") < r.getField("value"), 1)
          .when(l.getField("key") < r.getField("key"), -1)
          .when(l.getField("key") > r.getField("key"), 1)
          .otherwise(0)
    )
    array_join(
      transform(slice(sorted, 1, k), e => concat_ws(":", e.getField("key"), e.getField("value"))),
      ","
    )
  }
}
