package graft.pages

import graft.correct.{Cells, Correctors, Fd, Pdep}
import graft.rollup.Rollup
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *    model, A13 decision rule).
  */
object PagePipeline {

  /** Rule-based detection (SURVEY.md §2.1 S7): returns the standard
    * error-cell relation `(row_id, col, error_value)`.
    *  - warc_ts at/before epoch -> mangled timestamp;
    *  - empty text with non-empty html -> nulled text;
    *  - lang differing from its domain's majority lang -> mislabel.
    */
  def detectErrors(pages: DataFrame): DataFrame = {
    val withId = PageGen
      .withRowId(pages)
      .withColumn("domain", PageGen.domainOf("url"))

    val tsErrors = withId
      .filter(col("warc_ts") <= timestamp_seconds(lit(0L)))
      .select(col("row_id"), lit("warc_ts").as("col"), col("warc_ts").cast("string").as("error_value"))

    val textErrors = withId
      .filter(col("text") === "" && length(col("html")) > 0)
      .select(col("row_id"), lit("text").as("col"), col("text").as("error_value"))

    // domain-majority lang (two-phase count + argmax; ties break lex)
    val counts = withId.groupBy("domain", "lang").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("domain")
      .orderBy(col("cnt").desc, col("lang").asc)
    val majority = counts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("domain"), col("lang").as("majority_lang"))
    val langErrors = withId
      .join(broadcast(majority), "domain")
      .filter(col("lang") =!= col("majority_lang"))
      .select(col("row_id"), lit("lang").as("col"), col("lang").as("error_value"))

    tsErrors.unionByName(textErrors).unionByName(langErrors)
  }

  /** Repair all detected errors; returns the corrected page table with
    * the original five columns.
    */
  def repair(pages: DataFrame): DataFrame = {
    val withId = PageGen
      .withRowId(pages)
      .withColumn("domain", PageGen.domainOf("url"))
    val errors = detectErrors(pages)

    val htmlStr = decode(col("html"), "UTF-8")

    // direct expression repairs: exact values recovered from html
    val tsRepairs = withId
      .join(errors.filter(col("col") === "warc_ts").select("row_id"), Seq("row_id"))
      .select(
        col("row_id"),
        lit("warc_ts").as("col"),
        regexp_extract(htmlStr, "<!--warc_ts:(\\d+)-->", 1).as("value")
      )
    val textRepairs = withId
      .join(errors.filter(col("col") === "text").select("row_id"), Seq("row_id"))
      .select(
        col("row_id"),
        lit("text").as("col"),
        regexp_extract(htmlStr, "(?s)<body>(.*)</body>", 1).as("value")
      )

    // FD corrector for lang over domain->lang
    val strTable = withId.select(col("row_id"), col("domain"), col("lang"))
    val langErrors = errors.filter(col("col") === "lang")
    val fds = Seq(Fd(Seq("domain"), "lang"))
    val gpdeps = Pdep.gpdepTable(strTable, langErrors, "row_id", fds)
    val langSugg = Correctors.fdCorrector(strTable, langErrors, "row_id", gpdeps, fds)
    val langRepairs = Correctors.decide(langSugg)

    // string-typed cells overlay via the standard correction-apply path
    val corrections = textRepairs.unionByName(langRepairs)
    val repairedWide = Cells.applyCorrections(withId, corrections, "row_id", Seq("text", "lang"))

    // timestamp repair applied separately (epoch-seconds string -> ts)
    val tsFix = tsRepairs.select(col("row_id"), col("value").as("ts_epoch"))
    repairedWide
      .join(tsFix, Seq("row_id"), "left")
      .withColumn(
        "warc_ts",
        when(col("ts_epoch").isNotNull, timestamp_seconds(col("ts_epoch").cast("long")))
          .otherwise(col("warc_ts"))
      )
      .select("url", "warc_ts", "html", "text", "lang")
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
