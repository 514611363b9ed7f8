package graft.pages

import graft.correct.{Cells, Correctors, Fd, Pdep}
import graft.rollup.Rollup
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The north-rule pipeline: rule-based error detection -> corrector
  * ensemble repair -> tiered rollup, over the `(url, warc_ts, html,
  * text, lang)` page table.
  *
  * Repair is Mimir's per-cell correction recast as partition-parallel
  * typed DataFrame jobs (SURVEY.md §7 determinism policy):
  *  - `text`: restored byte-identically from the html body
  *    (whole-cell replacement with an observed value only — the
  *    per-url byte-identity invariant holds by construction);
  *  - `warc_ts`: re-parsed from the html header comment;
  *  - `lang`: FD corrector over domain->lang (gpdep-weighted count
  *    model, A13 decision applied once per lhs value — see
  *    `Correctors.decideBy`).
  *
  * Scan discipline (the property that matters at 10^12 rows): the big
  * table is scanned exactly TWICE end to end —
  *   1. one domain->lang count model (a single hash aggregate, tiny
  *      result) from which BOTH the majority-lang model and the
  *      masked FD-corrector counts derive: the cells masked by
  *      detection are exactly the non-majority rows, so the masked
  *      count relation is the counts filtered to each domain's
  *      majority lang — no second scan needed;
  *   2. the single output pass that flags + repairs every cell with
  *      pure expressions and two broadcast joins (majority model,
  *      per-domain decision).
  * Everything else operates on error-fraction-sized or
  * model-sized relations.
  */
object PagePipeline {

  private def flagCols(majorityJoined: DataFrame): DataFrame =
    majorityJoined
      .withColumn("__ts_bad", col("warc_ts") <= timestamp_seconds(lit(0L)))
      .withColumn("__text_bad", col("text") === "" && length(col("html")) > 0)
      .withColumn("__lang_bad", col("lang") =!= col("__majority_lang"))

  /** Domain-majority lang model: one aggregate + per-domain argmax
    * with lexicographic tie-break (tiny relation, broadcast by
    * callers).
    */
  def majorityLang(withDomain: DataFrame): DataFrame = {
    val counts = withDomain.groupBy("domain", "lang").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("domain").orderBy(col("cnt").desc, col("lang").asc)
    counts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("domain"), col("lang").as("__majority_lang"))
  }

  private def withIdDomain(pages: DataFrame): DataFrame =
    PageGen.withRowId(pages).withColumn("domain", PageGen.domainOf("url"))

  /** Rule-based detection (SURVEY.md §2.1 S7): returns the standard
    * error-cell relation `(row_id, col, error_value)` in a single pass
    * over the flagged table (conditional-array explode, no unions of
    * separate scans).
    *  - warc_ts at/before epoch -> mangled timestamp;
    *  - empty text with non-empty html -> nulled text;
    *  - lang differing from its domain's majority lang -> mislabel.
    */
  def detectErrors(pages: DataFrame): DataFrame = {
    val withId = withIdDomain(pages)
    val flagged = flagCols(withId.join(broadcast(majorityLang(withId)), "domain"))
    flagged
      .select(
        col("row_id"),
        explode(
          expr(
            """filter(array(
                 if(__ts_bad,   struct('warc_ts' as col, cast(warc_ts as string) as error_value), null),
                 if(__text_bad, struct('text'    as col, text                    as error_value), null),
                 if(__lang_bad, struct('lang'    as col, lang                    as error_value), null)
               ), x -> x is not null)"""
          )
        ).as("e")
      )
      .select(col("row_id"), col("e.col").as("col"), col("e.error_value").as("error_value"))
  }

  /** The (domain, lang) count model over RAW rows — the single model
    * scan every repair derives from. Sum-mergeable: counts over a
    * union of batches = summed per-batch counts, which is what makes
    * the model incrementally maintainable (`PageModel.update`) with
    * NO full-table rescan per continuous-rollup update.
    */
  def langCounts(pages: DataFrame): DataFrame =
    withIdDomain(pages).groupBy("domain", "lang").agg(count(lit(1)).as("cnt"))

  /** Repair all detected errors; returns the corrected page table with
    * the original five columns. Computes the count model from `pages`
    * itself — for partition-pruned incremental repair pass a
    * full-table model to `repairWithCounts` instead.
    */
  def repair(pages: DataFrame): DataFrame =
    repairWithCounts(pages, langCounts(pages))

  /** Repair with an externally supplied (domain, lang, cnt) count
    * model. The model must cover (at least) the domains present in
    * `pages`; decisions then depend only on the model, so repairing a
    * pruned subset of the table equals restricting a full-table repair
    * to that subset — the exactness contract incremental tier updates
    * rely on.
    */
  def repairWithCounts(pages: DataFrame, counts0: DataFrame): DataFrame = {
    val withId = withIdDomain(pages)
    val langCounts = counts0.cache()
    val w = Window.partitionBy("domain").orderBy(col("cnt").desc, col("lang").asc)
    val majority = broadcast(
      langCounts
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("domain"), col("lang").as("__majority_lang"))
    )
    val flagged = flagCols(withId.join(majority, "domain"))

    // FD corrector model for lang (domain -> lang), masked at row
    // level over the FD's columns exactly like Pdep.fdCounts. The
    // masked rows are precisely those whose lang differs from the
    // domain majority, so the masked count model IS the count relation
    // restricted to each domain's majority lang — derived from the
    // same scan, not a second one.
    val fd = Fd(Seq("domain"), "lang")
    val counts = langCounts
      .join(majority, "domain")
      .filter(col("lang") === col("__majority_lang"))
      .select(col("domain"), col("lang"), col("cnt"))
      .withColumn("lhs_cnt", sum(col("cnt")).over(Window.partitionBy("domain")))
      .cache()
    val stats = Pdep.statsFromCounts(counts, fd)
    // single FD: norm_gpdep = 1 when gpdep > 0 (normalized over itself)
    val normGpdep = stats.gpdep.map(g => if (g > 0) 1.0 else 0.0).getOrElse(0.0)

    // per-lhs-value decision (equivalent to per-cell A13 here — every
    // error cell of a domain sees identical suggestions)
    val sugg = counts.select(
      col("domain"),
      col("lang").as("candidate"),
      lit(normGpdep).as("score")
    )
    val decided = Correctors
      .decideBy(sugg, Seq("domain"))
      .select(col("domain"), col("candidate").as("__lang_fix"))

    // single output pass: pure-expression repairs + broadcast join
    val htmlStr = decode(col("html"), "UTF-8")
    flagged
      .join(broadcast(decided), Seq("domain"), "left")
      .select(
        col("url"),
        when(
          col("__ts_bad"),
          timestamp_seconds(regexp_extract(htmlStr, "<!--warc_ts:(\\d+)-->", 1).cast("long"))
        ).otherwise(col("warc_ts")).as("warc_ts"),
        col("html"),
        when(col("__text_bad"), regexp_extract(htmlStr, "(?s)<body>(.*)</body>", 1))
          .otherwise(col("text")).as("text"),
        when(col("__lang_bad") && col("__lang_fix").isNotNull, col("__lang_fix"))
          .otherwise(col("lang")).as("lang")
      )
  }

  /** Corrected pages -> hourly tier keyed by domain, with point count,
    * byte size, and lang histogram.
    */
  def hourlyRollup(pages: DataFrame): DataFrame = {
    val repaired = repair(pages)
    Rollup.fromRaw(
      repaired.withColumn("domain", PageGen.domainOf("url")),
      Seq("domain"),
      "warc_ts",
      "1h",
      length(col("html")).cast("long"),
      langCol = Some("lang")
    )
  }

  /** Fixed-size smoke entry used by `SparkEntry.entry` / q25. */
  def hourlyRollupFixed(spark: SparkSession, nPages: Long): DataFrame = {
    val dirty = PageGen.corrupt(PageGen.clean(spark, nPages))
    hourlyRollup(dirty).drop("lang_hist")
  }
}
