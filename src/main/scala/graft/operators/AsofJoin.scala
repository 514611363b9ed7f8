package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the canonical timeseries join Spark's built-in operators
  * lack as a primitive: for every left row, attach the single right row
  * with the nearest timestamp at or before it (`backward`, the default)
  * or at or after it (`forward`), per key. Left-outer semantics: every
  * left row survives, with null right columns when nothing qualifies.
  *
  * Spark-first plan (composition, not a custom physical operator): both
  * sides are tagged and unioned, hash-partitioned on the key ONCE, and
  * sorted in-partition by (ts, side, right-struct); a running
  * `last(right, ignoreNulls)` window then carries the nearest qualifying
  * right row onto each left row. This is exactly the sort-merge shape a
  * native as-of operator would run — one shuffle of each side, no row
  * ever compared to more than its neighbours — and avoids the
  * O(left × right-per-key) blowup of the naive range-join (`l.ts >=
  * r.ts` join + argmax) which Catalyst can only execute as a
  * per-key cartesian.
  *
  * Scale notes: the only shuffle is the hash exchange on `keys` shared
  * by both sides; AQE handles moderate key skew. A single pathologically
  * hot key serializes into one task — the standard mitigation (slice
  * time into coarse epochs, replicate each right row into the epoch it
  * starts in and the next, join on (key, epoch)) composes on top of this
  * operator but is not built in.
  *
  * Determinism: ties on the right side (several right rows sharing one
  * timestamp) resolve to the LARGEST right row (struct-lexicographic) in
  * both directions; callers wanting a specific rule should pre-reduce
  * the right side to unique (key, ts). Null right timestamps are
  * ignored; null left timestamps get no match.
  */
object AsofJoin {

  /** @param keys            equality-join key columns (present both sides)
    * @param leftTs          left timestamp column name
    * @param rightTs         right timestamp column name (kept in the output)
    * @param direction       "backward" (right.ts <= left.ts, nearest) or
    *                        "forward" (right.ts >= left.ts, nearest)
    * @param toleranceMicros optional max |left.ts − right.ts| in
    *                        microseconds; matches farther away null out
    * @return left columns ++ right non-key columns (names must not collide)
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      direction: String = "backward",
      toleranceMicros: Option[Long] = None
  ): DataFrame = {
    require(
      direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got '$direction'"
    )
    val rightPayload = right.columns.toSeq.filterNot(keys.contains)
    val collisions = rightPayload.toSet.intersect(left.columns.toSet)
    require(
      collisions.isEmpty,
      s"right payload columns collide with left columns: ${collisions.mkString(", ")} — rename before joining"
    )

    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__l", struct(left.columns.map(col): _*))
      .withColumn("__r", lit(null).cast(right.select(struct(rightPayload.map(col): _*)).schema.head.dataType))
      .select((Seq("__ts", "__side", "__l", "__r") ++ keys).map(col): _*)
    val r = right
      .filter(col(rightTs).isNotNull)
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__l", lit(null).cast(left.select(struct(left.columns.map(col): _*)).schema.head.dataType))
      .withColumn("__r", struct(rightPayload.map(col): _*))
      .select((Seq("__ts", "__side", "__l", "__r") ++ keys).map(col): _*)

    // ordering: rights sort BEFORE lefts at equal timestamps (so a tie
    // matches), and among equal-timestamp rights the struct-largest row
    // is traversed last (so `last(...)` picks it) in both directions
    val order: Seq[Column] = direction match {
      case "backward" => Seq(col("__ts").asc, col("__side").asc, col("__r").asc)
      case "forward"  => Seq(col("__ts").desc, col("__side").asc, col("__r").asc)
    }
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l
      .unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val withinTol: Column = toleranceMicros match {
      case None => lit(true)
      case Some(tol) =>
        // cast handles TIMESTAMP_NTZ inputs (exact under the engine's
        // pinned UTC session timezone)
        abs(
          unix_micros(col("__ts").cast("timestamp")) -
            unix_micros(col("__match").getField(rightTs).cast("timestamp"))
        ) <= tol
    }
    // null left timestamps sort last under the forward (desc) ordering
    // and would otherwise inherit the key's final right row
    val keep = col("__ts").isNotNull && col("__match").isNotNull && withinTol
    val outCols =
      left.columns.toSeq.map(c => col("__l").getField(c).as(c)) ++
        rightPayload.map(c => when(keep, col("__match").getField(c)).as(c))
    carried.select(outCols: _*)
  }
}
