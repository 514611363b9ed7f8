package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-threshold sampling — the sampling a 100-TB
  * training-data pipeline needs where `df.sample()` cannot serve:
  * `sample()` draws per-partition pseudo-randoms, so its output
  * changes with partitioning, task retries, and AQE re-plans, while a
  * hash threshold is a pure row function — stable across runs,
  * engines, and cluster layouts, join-compatible (the same id always
  * lands in the same split), and replayable by the SQL oracle.
  *
  * u(id) = first 15 hex digits of md5(id ∥ salt) / 16^15 — uniform on
  * [0, 1) with ~2^-60 granularity (the repo's portable-hash recipe:
  * `conv(substring(md5(x), 1, 15), 16, 10)` ↔ DuckDB
  * `('0x' ∥ substr(md5(x), 1, 15))::BIGINT`). Keep a row iff
  * u < fraction. Changing `salt` draws an independent sample;
  * `fraction` is monotone (a 1% sample is a subset of a 10% sample at
  * the same salt — nested samples for scaling-law sweeps).
  *
  * Stratified form: per-stratum fractions via a tiny `when` ladder
  * (the strata map is driver-known config, never a data-sized
  * relation) — each stratum is down/up-weighted independently, e.g.
  * per-language balancing of a crawl corpus.
  */
object Sampling {

  private val Denom = math.pow(16.0, 15.0) // 2^60

  /** Uniform [0,1) hash of `id` under `salt` (codegen'd built-ins). */
  def hashUniform(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit("|"), lit(salt))), 1, 15), 16, 10)
      .cast("bigint")
      .cast("double") / lit(Denom)

  /** Keep each row with probability `fraction`, deterministically. */
  def sampleBy(df: DataFrame, idCol: String, fraction: Double, salt: String): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1], got $fraction")
    df.filter(hashUniform(col(idCol), salt) < fraction)
  }

  /** Per-stratum fractions; strata absent from the map fall back to
    * `defaultFraction`.
    */
  def stratifiedSampleBy(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double,
      salt: String
  ): DataFrame = {
    (fractions.values.toSeq :+ defaultFraction).foreach(f =>
      require(f >= 0 && f <= 1, s"fractions must be in [0,1], got $f")
    )
    val frac = fractions.toSeq.sortBy(_._1).foldLeft(lit(defaultFraction)) {
      case (acc, (stratum, f)) => when(col(strataCol) === stratum, lit(f)).otherwise(acc)
    }
    df.filter(hashUniform(col(idCol), salt) < frac)
  }
}
