package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** XML sitemap parsing (sitemaps.org protocol) — the crawl-discovery
  * companion to [[Robots]]: a host's sitemap enumerates the URLs it
  * WANTS crawled, with optional freshness hints.
  *
  * `parseUrlset` flat-maps one sitemap-XML column into one row per
  * `<url>` entry: split on the closing tag, keep fragments containing
  * an opening tag, then one codegen regexp per field in the
  * Java ∩ RE2 dialect (the WARC/PII discipline) — a ZERO-SHUFFLE
  * explode+map stage at any corpus size. Entries tolerate arbitrary
  * whitespace between tags; optional fields (`lastmod`,
  * `changefreq`, `priority`) read null when absent; fragments outside
  * `<url>` blocks (the XML prolog, the `<urlset>` envelope, garbage)
  * produce no rows. This is deliberately a TAG-LEVEL parser, not an
  * XML DOM: sitemap files are machine-generated and flat, and the
  * regex path keeps the whole parse inside whole-stage codegen.
  */
object Sitemap {

  private def field(e: Column, tag: String): Column = {
    val m = regexp_extract(e, s"<$tag>\\s*([^<]*?)\\s*</$tag>", 1)
    when(m =!= "", m)
  }

  /** One row per `<url>` entry: every input column is carried, plus
    * (loc, lastmod, changefreq, priority). The xml column is dropped.
    */
  def parseUrlset(df: DataFrame, xmlCol: String): DataFrame =
    df.withColumn("__entry", explode(filter(split(col(xmlCol), "</url>"), _.contains("<url>"))))
      .withColumn("loc", field(col("__entry"), "loc"))
      .withColumn("lastmod", field(col("__entry"), "lastmod"))
      .withColumn("changefreq", field(col("__entry"), "changefreq"))
      .withColumn("priority", field(col("__entry"), "priority").cast("double"))
      .drop("__entry", xmlCol)
}
