package graft.pages

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic Common-Crawl-style page table
  * `(url, warc_ts, html, text, lang)` per BASELINE.json `input_hint`
  * and FIXTURES.md §4.
  *
  * Everything derives from `spark.range(n)` + seeded `xxhash64`
  * mixing — pure Catalyst expressions, so the same (seed, nPages)
  * produces byte-identical tables at any parallelism level (the
  * property the scaling bench and resume tests rely on).
  *
  * Shape properties the tests exploit:
  *  - Zipf-ish domain skew (domain 0 is hot) -> salting/AQE tests;
  *  - `lang` is functionally determined by domain -> the FD corrector
  *    can repair lang mislabels;
  *  - `html` embeds both the crawl timestamp (header comment) and the
  *    exact `text` bytes (body) -> timestamp/text repair is exact;
  *  - `warc_ts` spans 35 days with deterministic hour gaps -> the 30d
  *    tier gets >=2 buckets and gap-fill has real gaps.
  */
object PageGen {

  val Langs: Seq[String] = Seq("en", "de", "fr", "es", "it", "nl")

  /** Epoch second of 2024-01-01T00:00:00Z. */
  val BaseEpoch: Long = 1704067200L

  val SpanSeconds: Long = 35L * 86400

  def clean(spark: SparkSession, nPages: Long, nDomains: Int = 50, seed: Int = 42): DataFrame = {
    val h = xxhash64(col("id"), lit(seed))
    val u01 = pmod(h, lit(1000000L)).cast("double") / lit(1000000.0)
    // Zipf-ish skew: cube of uniform pushes mass to low domain indices
    val domainIdx = floor(pow(u01, 3.0) * nDomains).cast("int")
    val lang = element_at(
      array(Langs.map(lit): _*),
      pmod(domainIdx, lit(Langs.size)).cast("int") + 1
    )
    // deterministic timestamp with hour-shaped gaps: hours where
    // hash(hour) % 5 == 0 receive no pages (shifted forward one hour)
    val rawOffset = pmod(xxhash64(col("id"), lit(seed + 7)), lit(SpanSeconds))
    val hourIdx = floor(rawOffset / 3600).cast("long")
    val offset = when(pmod(xxhash64(hourIdx, lit(seed + 1)), lit(5)) === 0, rawOffset + 3600)
      .otherwise(rawOffset)
    val ts = timestamp_seconds(lit(BaseEpoch) + offset)

    val url = concat(lit("https://site"), domainIdx, lit(".example/p/"), col("id"))
    val text = concat(
      lit("tok"), pmod(h, lit(997L)),
      lit(" word"), pmod(h, lit(131L)),
      lit(" page content "), col("id"),
      lit(" tail"), pmod(h, lit(17L))
    )
    val html = concat(
      lit("<html><head><!--warc_ts:"),
      (lit(BaseEpoch) + offset).cast("string"),
      lit("--></head><body>"),
      text,
      lit("</body></html>")
    )

    spark
      .range(nPages)
      .select(
        url.as("url"),
        ts.as("warc_ts"),
        encode(html, "UTF-8").as("html"),
        text.as("text"),
        lang.as("lang")
      )
  }

  /** MCAR-style corruption (reference error injector,
    * `datasets/helpers.py:26-116`, re-derived as seed-stable Catalyst
    * expressions): per class, a deterministic `fraction` of rows is
    * corrupted, selected by `xxhash64(url, classSeed)`.
    *  - lang mislabel: rotate to the next valid lang code;
    *  - mangled timestamp: reset to epoch 0 (recoverable from html);
    *  - null text: empty string (html body keeps the exact bytes).
    */
  def corrupt(clean: DataFrame, fraction: Double = 0.05, seed: Int = 42): DataFrame = {
    def hit(classSeed: Int) =
      pmod(xxhash64(col("url"), lit(seed * 1000 + classSeed)), lit(10000L)) <
        lit((fraction * 10000).toLong)

    val langIdx = expr(s"array_position(array(${Langs.map(l => s"'$l'").mkString(",")}), lang)")
    val rotatedLang = element_at(
      array(Langs.map(lit): _*),
      (pmod(langIdx, lit(Langs.size.toLong)) + 1).cast("int")
    )

    clean
      .withColumn("lang", when(hit(1), rotatedLang).otherwise(col("lang")))
      .withColumn("warc_ts", when(hit(2), timestamp_seconds(lit(0L))).otherwise(col("warc_ts")))
      .withColumn("text", when(hit(3), lit("")).otherwise(col("text")))
  }

  /** Stable numeric row id derived from the url (never
    * monotonically_increasing_id — SURVEY.md §7).
    */
  def withRowId(df: DataFrame): DataFrame =
    df.withColumn("row_id", regexp_extract(col("url"), "/p/(\\d+)$", 1).cast("long"))

  /** Domain of an url — `substring_index` chain, not a regex: this
    * runs per row in every scan of the pipeline (grouping key, count
    * models, repair output), and a linear byte scan is several times
    * cheaper than an NFA match at 10^12 rows.
    */
  def domainOf(urlCol: String): org.apache.spark.sql.Column =
    substring_index(substring_index(col(urlCol), "://", -1), "/", 1)
}
