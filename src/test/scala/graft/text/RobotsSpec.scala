package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RFC 9309 robots.txt parsing + longest-match crawl verdicts. */
class RobotsSpec extends SparkSpec {

  import spark.implicits._

  private val robotsTxt =
    """# crawl policy            <- comment line strips
      |User-agent: evilbot
      |Disallow: /
      |
      |USER-AGENT: googlebot    # consecutive UA lines share one group
      |user-agent: *
      |Disallow: /doc/
      |Allow: /doc/1
      |disallow: /doc/12
      |Crawl-delay: 5
      |Disallow:
      |Sitemap: https://h/sitemap.xml
      |""".stripMargin

  private def rules(agent: String) =
    Robots.parseRules(Seq(("h1", robotsTxt)).toDF("host", "txt"), "host", "txt", agent)

  test("group selection, case-insensitive fields, comments, empty values, unknown fields") {
    val got = rules("mybot").orderBy("rule", "prefix").as[(String, String, String)].collect().toSeq
    // the evilbot group's Disallow: / must NOT leak into *'s rules;
    // the empty Disallow and Crawl-delay/Sitemap lines vanish
    assert(got == Seq(
      ("h1", "allow", "/doc/1"),
      ("h1", "disallow", "/doc/"),
      ("h1", "disallow", "/doc/12")))
    // the named agent gets the evilbot group instead of *'s
    val evil = rules("EvilBot").as[(String, String, String)].collect().toSeq
    assert(evil == Seq(("h1", "disallow", "/")))
    // googlebot shares *'s group via the consecutive UA lines
    assert(rules("googlebot").count() == 3)
  }

  test("longest match wins, Allow wins ties, no match defaults to allowed") {
    val urls = Seq(
      (1L, "h1", "/doc/7"),    // matches /doc/ only -> disallow
      (2L, "h1", "/doc/15"),   // /doc/1 (allow, len 6) beats /doc/ -> allow
      (3L, "h1", "/doc/123"),  // /doc/12 (len 7) beats /doc/1 -> disallow
      (4L, "h1", "/about"),    // no rule matches -> allowed
      (5L, "h2", "/doc/7")     // host without robots -> allowed
    ).toDF("id", "host", "path")
    val got = Robots.decide(urls, rules("mybot"), Seq("id"), "host", "path")
      .select("id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> false, 4L -> true, 5L -> true))
  }

  test("an equal-length Allow/Disallow pair resolves to Allow (the RFC tie rule)") {
    val r = Seq(("h", "allow", "/a/b"), ("h", "disallow", "/a/b")).toDF("host", "rule", "prefix")
    val urls = Seq((1L, "h", "/a/b/c")).toDF("id", "host", "path")
    val got = Robots.decide(urls, r, Seq("id"), "host", "path").select("allowed").as[Boolean].head()
    assert(got)
  }
}
