package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout keys: interleave the bits of two dimension
  * hashes so that range-partitioning on the single z value co-locates
  * rows that are close in BOTH dimensions. Files then carry tight
  * min/max ranges on each original dimension, and a predicate on
  * EITHER dimension prunes files — the multi-dimensional clustering
  * trick table formats use at 100-TB scale, where a single-column sort
  * gives perfect pruning on the leading column and none on the rest.
  *
  * Dimensions are 16-bit portable hashes (the repo's md5 recipe, same
  * as [[Sampling.hashUniform]]) — deterministic across engines,
  * partitionings, and retries, so the z value is a pure row function
  * the SQL oracle replays bit-for-bit. All arithmetic is integer
  * shift/mask/add on longs; the 32-term interleave is unrolled
  * statically into one codegen'd expression tree.
  *
  * Scale shape: computing z is a map-only stage; `layout` adds the one
  * range exchange any clustered write needs (sampling the z
  * distribution, which is near-uniform by construction — no skew).
  */
object ZOrder {

  /** Lower 16 bits of the portable md5 hash of `c` under `salt`. */
  def hash16(c: Column, salt: String): Column =
    conv(substring(md5(concat(c.cast("string"), lit("|"), lit(salt))), 1, 15), 16, 10)
      .cast("bigint")
      .bitwiseAND(lit(65535L))

  /** Morton interleave of two 16-bit values: bit i of `a` lands at
    * position 2i, bit i of `b` at 2i+1.
    */
  def zValue(a: Column, b: Column): Column =
    (0 to 15)
      .map { i =>
        shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
          shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
      }
      .reduce(_ + _)

  /** The z key for two columns under per-dimension salts. */
  def zKey(colA: Column, saltA: String, colB: Column, saltB: String): Column =
    zValue(hash16(colA, saltA), hash16(colB, saltB))

  /** Range-cluster `df` into `numPartitions` write tasks by the z key
    * of (`colA`, `colB`) — the pre-write layout step.
    */
  def layout(
      df: DataFrame,
      colA: String,
      colB: String,
      numPartitions: Int,
      saltA: String = "za",
      saltB: String = "zb"): DataFrame = {
    require(numPartitions >= 1, s"numPartitions must be >= 1, got $numPartitions")
    df.withColumn("__z", zKey(col(colA), saltA, col(colB), saltB))
      .repartitionByRange(numPartitions, col("__z"))
      .drop("__z")
  }
}
