package graft.text

import graft.SparkSpec

/** Sitemap urlset parsing: entry explosion, optional fields,
  * whitespace tolerance, non-entry fragments.
  */
class SitemapSpec extends SparkSpec {

  import spark.implicits._

  private val xml =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url>
      |    <loc>  https://h/a  </loc>
      |    <lastmod>2024-01-05</lastmod>
      |    <changefreq>daily</changefreq>
      |    <priority>0.8</priority>
      |  </url>
      |  <url><loc>https://h/b</loc></url>
      |  stray text between entries
      |  <url><loc>https://h/c</loc><priority>0.3</priority></url>
      |</urlset>
      |""".stripMargin

  test("one row per url entry; optional fields null; whitespace trimmed; envelope ignored") {
    val got = Sitemap
      .parseUrlset(Seq(("h", xml)).toDF("host", "xml"), "xml")
      .orderBy("loc")
      .as[(String, String, Option[String], Option[String], Option[Double])]
      .collect()
      .toSeq
    assert(got == Seq(
      ("h", "https://h/a", Some("2024-01-05"), Some("daily"), Some(0.8)),
      ("h", "https://h/b", None, None, None),
      ("h", "https://h/c", None, None, Some(0.3))))
  }

  test("a sitemap with no entries yields no rows, not a null row") {
    val empty = """<?xml version="1.0"?><urlset></urlset>"""
    assert(Sitemap.parseUrlset(Seq(("h", empty)).toDF("host", "xml"), "xml").count() == 0)
  }
}
