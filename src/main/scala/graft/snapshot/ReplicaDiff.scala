package graft.snapshot

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Merkle-style replica reconciliation — "are these two copies of the
  * table the same, and if not, WHICH partitions differ?": the
  * cross-region / backup / migration audit that must never ship the
  * data itself. Each partition reduces to an ORDER-FREE content
  * digest (XOR of portable per-row 60-bit md5-prefix hashes — XOR is
  * commutative, associative, and overflow-free, so the digest is
  * independent of row order, partitioning, and engine) plus a row
  * count; two replicas then compare digest relations, not rows.
  *
  * At 100 TB the comparison ships one (partition, digest, count) row
  * per partition per side — bytes, not data — and only divergent
  * partitions are re-read for row-level repair. The per-side digest
  * pass is one partial-aggregated scan (XOR combines map-side).
  *
  * Caveat (inherent to XOR digests): a pair of DUPLICATE rows cancels
  * out, which is why the row count rides alongside — count catches
  * even-multiplicity tampering that XOR alone would miss.
  */
object ReplicaDiff {

  /** Order-free per-partition digest: (partCols..., digest, n_rows).
    * Rows hash over `contentCols` joined with \u0001 after string
    * casts; null cells become \u0002 (so null and empty differ).
    */
  def digests(df: DataFrame, partCols: Seq[String], contentCols: Seq[String]): DataFrame = {
    val cell = contentCols.map(c => coalesce(col(c).cast("string"), lit("\u0002")))
    val h = conv(substring(md5(concat_ws("\u0001", cell: _*)), 1, 15), 16, 10).cast("long")
    df.withColumn("__h", h)
      .groupBy(partCols.map(col): _*)
      .agg(expr("bit_xor(__h)").as("digest"), count(lit(1)).as("n_rows"))
  }

  /** Compare two replicas partition-by-partition. Returns one row per
    * partition present on either side:
    * (partCols..., digest_a, n_a, digest_b, n_b, status) with status
    * in {match, diverged, missing_in_b, missing_in_a}.
    */
  def diff(
      a: DataFrame,
      b: DataFrame,
      partCols: Seq[String],
      contentCols: Seq[String]
  ): DataFrame = {
    val da = digests(a, partCols, contentCols)
      .withColumnRenamed("digest", "digest_a")
      .withColumnRenamed("n_rows", "n_a")
    val db = digests(b, partCols, contentCols)
      .withColumnRenamed("digest", "digest_b")
      .withColumnRenamed("n_rows", "n_b")
    da
      .join(db, partCols, "full_outer")
      .withColumn(
        "status",
        when(col("digest_a").isNull, lit("missing_in_a"))
          .when(col("digest_b").isNull, lit("missing_in_b"))
          .when(col("digest_a") === col("digest_b") && col("n_a") === col("n_b"), lit("match"))
          .otherwise(lit("diverged"))
      )
  }
}
