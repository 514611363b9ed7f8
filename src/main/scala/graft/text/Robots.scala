package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robots Exclusion Protocol (RFC 9309) — the crawl-permission gate a
  * web-scale ingest runs before fetching or keeping a URL.
  *
  * Two halves, mirroring how a crawler actually deploys them:
  *
  *  - [[parseRules]] turns raw `robots.txt` text (one row per host)
  *    into the (host, rule, prefix) relation for ONE requested agent:
  *    group semantics per the RFC — consecutive `User-agent` lines
  *    open a group, the group's rules apply when it names the agent or
  *    `*`; comments (`#` to end of line) strip; field names match
  *    case-insensitively; unknown fields (Crawl-delay, Sitemap) are
  *    ignored; an EMPTY Allow/Disallow value matches nothing and is
  *    dropped at parse. Per-host robots files are tiny (the RFC caps
  *    parse obligation at 500 KiB), so the two (host)-keyed window/agg
  *    shuffles here run on a relation the size of the HOST set, not
  *    the corpus.
  *
  *  - [[decide]] stamps each URL row allowed/denied: candidate rules
  *    attach via a BROADCAST join (the rule relation stays dim-sized;
  *    the 100-TB URL side never shuffles for the match), and the RFC's
  *    longest-match-wins / Allow-wins-ties verdict is a partial-
  *    aggregated `max(struct(prefix_len, is_allow))` per URL key — an
  *    order-free reduce, no window over the corpus. URLs matching no
  *    rule are allowed (the RFC default).
  *
  * Prefix matching only (the RFC's MUST); `*`/`$` wildcard patterns
  * (a SHOULD) are not implemented — a rule containing them would need
  * the regex-compile path documented here before trusting its verdict.
  */
object Robots {

  /** Parse one-robots-file-per-row text into (host, rule, prefix) for
    * `agent`, where rule ∈ {allow, disallow}. `hostCol` is the join
    * key [[decide]] matches URLs on.
    */
  def parseRules(robots: DataFrame, hostCol: String, txtCol: String, agent: String): DataFrame = {
    val lines = robots
      .select(col(hostCol).as("host"), posexplode(split(col(txtCol), "\n")).as(Seq("ln", "raw")))
      .withColumn("line", trim(regexp_replace(col("raw"), "#.*$", "")))
      .withColumn("field", lower(trim(regexp_extract(col("line"), "^([^:]+):", 1))))
      .withColumn("value", trim(regexp_extract(col("line"), "^[^:]+:(.*)$", 1)))
    val isUa = col("field") === "user-agent"
    // a User-agent line NOT directly below another User-agent line
    // starts a new group (consecutive UA lines share their rules)
    val w = Window.partitionBy("host").orderBy("ln")
    val grouped = lines
      .withColumn("gid", sum((isUa && !coalesce(lag(isUa, 1).over(w), lit(false))).cast("long")).over(w))
    val groups = grouped
      .groupBy("host", "gid")
      .agg(
        collect_set(when(isUa, lower(col("value")))).as("agents"),
        collect_list(
          when(col("field").isin("allow", "disallow") && col("value") =!= "",
            struct(col("field").as("rule"), col("value").as("prefix")))
        ).as("rules")
      )
      .withColumn("exact", array_contains(col("agents"), lit(agent.toLowerCase)))
      // RFC precedence: when any group names the agent exactly, the
      // `*` groups do not apply to it
      .withColumn("has_exact", max(col("exact")).over(Window.partitionBy("host")))
      .filter(col("exact") || (!col("has_exact") && array_contains(col("agents"), lit("*"))))
    groups
      .select(col("host"), explode(col("rules")).as("r"))
      .select(col("host"), col("r.rule").as("rule"), col("r.prefix").as("prefix"))
  }

  /** Stamp each URL row with its RFC 9309 verdict. `keyCols` must
    * uniquely identify a row (true duplicates would collapse in the
    * verdict reduce); `pathCol` is the URL path to match rule
    * prefixes against.
    *
    * Plan shape: ONE broadcast LEFT join (every URL row survives,
    * matched or not) + ONE partial-aggregated struct-max reduce over
    * the url columns — no join-back of a winner relation onto the
    * corpus (that join-back is a corpus×corpus sort-merge join;
    * PlanSpec pins its absence).
    */
  def decide(
      urls: DataFrame,
      rules: DataFrame,
      keyCols: Seq[String],
      hostCol: String,
      pathCol: String
  ): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must name the URL row identity")
    val u = urls.alias("u")
    val r = rules.alias("r")
    // verdict encoded in a lexicographically-ordered struct: longest
    // prefix first, and at equal length Allow (1) beats Disallow (0);
    // unmatched rows (null rule from the left join) are excluded from
    // the max, NOT encoded as a null-field struct (struct-with-null
    // ordering is not "absent")
    val verdict = when(
      col("r.rule").isNotNull,
      struct(
        length(col("r.prefix")).as("l"),
        (col("r.rule") === "allow").cast("int").as("a")))
    u.join(
      broadcast(r),
      col(s"u.$hostCol") === col("r.host") && col(s"u.$pathCol").startsWith(col("r.prefix")),
      "left")
      .groupBy(urls.columns.map(c => col(s"u.$c")): _*)
      .agg(max(verdict).as("__v"))
      .withColumn("allowed", coalesce(col("__v").getField("a") === 1, lit(true)))
      .drop("__v")
  }
}
