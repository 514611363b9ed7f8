package graft.rollup

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch for the tier engine — the "p50/p95 latency
  * per bucket" measure a 100-TB rollup needs where keeping raw values
  * is impossible. Rides `Rollup.fromRaw(quantiles=...)` /
  * `reRollup(quantileCols=...)` exactly like counts, HLL states and
  * top-k sketches, so coarser tiers re-aggregate the sketch instead of
  * rescanning raw data.
  *
  * Construction (same honesty contract as `TopK`):
  *  - state: `map<double,bigint>` of (value-centroid -> weight);
  *  - update/merge: weights sum at equal centroids — below `capacity`
  *    distinct values the state IS the exact weighted value histogram,
  *    commutative and associative, so results are merge-order-free
  *    ("exact mode", what the oracle-checked driver query runs in);
  *  - above capacity: deterministic equi-weight compaction — sort by
  *    value, fill bins of ~total/capacity weight, emit the weighted
  *    mean per bin (a t-digest with uniform size bound). Rank error is
  *    then bounded by the largest bin, ~N/capacity; which centroids
  *    result depends on merge order, inherent to bounded summaries.
  *
  * Quantile rule (both modes, and what the SQL oracle replays): the
  * smallest centroid whose ascending cumulative weight reaches
  * `q × total_weight`.
  */
object QuantileSketch {

  private type State = Map[Double, Long]

  private def compact(m: State, cap: Int): State =
    if (m.size <= cap) m
    else {
      val sorted = m.toSeq.sortBy(_._1)
      val total = sorted.iterator.map(_._2).sum
      val binW = total.toDouble / cap
      val out = Map.newBuilder[Double, Long]
      var emitted = 0
      var curW = 0L
      var curVW = 0.0 // weight-weighted value sum of the open bin
      var i = 0
      while (i < sorted.length) {
        val (v, w) = sorted(i)
        curW += w
        curVW += v * w
        // close the bin once it carries its share — unless it is the
        // final allowed bin, which absorbs everything remaining
        if (curW >= binW && emitted < cap - 1) {
          out += (curVW / curW -> curW)
          emitted += 1
          curW = 0L
          curVW = 0.0
        }
        i += 1
      }
      if (curW > 0L) out += (curVW / curW -> curW)
      out.result()
    }

  private def mergeMaps(a: State, b: State, cap: Int): State =
    compact(
      b.foldLeft(a) { case (acc, (v, w)) => acc.updated(v, acc.getOrElse(v, 0L) + w) },
      cap
    )

  private class SketchAgg(cap: Int) extends Aggregator[Option[Double], State, State] {
    def zero: State = Map.empty
    def reduce(b: State, v: Option[Double]): State = v match {
      case None     => b
      case Some(x)  => compact(b.updated(x, b.getOrElse(x, 0L) + 1L), cap)
    }
    def merge(a: State, b: State): State = mergeMaps(a, b, cap)
    def finish(r: State): State = r
    def bufferEncoder: Encoder[State] = ExpressionEncoder()
    def outputEncoder: Encoder[State] = ExpressionEncoder()
  }

  private class MergeAgg(cap: Int) extends Aggregator[State, State, State] {
    def zero: State = Map.empty
    def reduce(b: State, state: State): State =
      if (state == null) b else mergeMaps(b, state, cap)
    def merge(a: State, b: State): State = mergeMaps(a, b, cap)
    def finish(r: State): State = r
    def bufferEncoder: Encoder[State] = ExpressionEncoder()
    def outputEncoder: Encoder[State] = ExpressionEncoder()
  }

  /** Raw values -> sketch state (`map<double,bigint>`). */
  def sketch(value: Column, capacity: Int): Column =
    udaf(new SketchAgg(capacity), ExpressionEncoder[Option[Double]]())
      .apply(value.cast("double"))

  /** Finer-tier states -> coarser-tier state (the reRollup agg). */
  def mergeSketch(state: Column, capacity: Int): Column =
    udaf(new MergeAgg(capacity), ExpressionEncoder[State]()).apply(state)

  /** Read quantile `q` out of a state — built-in HOFs only (the stored
    * state stays a plain map any engine can query): ascending walk of
    * the centroids, first one whose cumulative weight reaches
    * `q × total`.
    *
    * The `q × total` target rides INSIDE the fold accumulator: a HOF
    * lambda that references an outer expression INLINES it, so putting
    * the target (itself a fold over the entries) in the lambda body
    * re-computes the total-weight aggregation at EVERY fold step —
    * O(n²) interpreted work per row that turned a 6 s query into 80 s
    * at sf0.1. In the zero expression it evaluates once per row.
    */
  def quantile(state: Column, q: Double): Column = {
    val entries = array_sort(map_entries(state)) // struct sort: key ascending
    val total = aggregate(entries, lit(0L), (acc, e) => acc + e.getField("value"))
    aggregate(
      entries,
      struct(
        lit(0L).as("cum"),
        lit(null).cast("double").as("ans"),
        (lit(q) * total.cast("double")).as("target")
      ),
      (acc, e) => {
        val cum2 = acc.getField("cum") + e.getField("value")
        struct(
          cum2.as("cum"),
          when(acc.getField("ans").isNull && cum2.cast("double") >= acc.getField("target"), e.getField("key"))
            .otherwise(acc.getField("ans"))
            .as("ans"),
          acc.getField("target").as("target")
        )
      },
      acc => acc.getField("ans")
    )
  }
}
