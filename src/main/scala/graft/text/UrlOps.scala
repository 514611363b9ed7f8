package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL operators for webtext corpora — canonicalization is the key
  * that makes crawl dedup work: the same page arrives as
  * `HTTPS://WWW.Site.COM:443/p#frag` and
  * `https://www.site.com/p?utm_source=feed`, and a byte-keyed dedup
  * treats them as distinct documents.
  *
  * Pure Catalyst expressions (regex + array HOFs, no UDF), kept to a
  * regex dialect both Java and the DuckDB oracle interpret
  * identically. Canonical form: lowercase scheme and host, default
  * ports (:80, :443) stripped, fragment dropped, tracking parameters
  * (utm_*, fbclid, gclid, ref) dropped, remaining query parameters
  * sorted. Deliberate simplifications (documented, not hidden): no
  * public-suffix list (registeredDomain is the last two host labels)
  * and no percent-encoding normalization.
  */
object UrlOps {

  def host(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1)), ":(443|80)$", "")

  /** Last two host labels — the naive registered domain (a real
    * deployment substitutes the public-suffix list, which is data, not
    * code).
    */
  def registeredDomain(url: Column): Column =
    regexp_extract(host(url), "([^.]+\\.[^.]+)$", 1)

  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z]+)://", 1))
    val path = regexp_extract(noFrag, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val kept = array_sort(
      filter(
        split(query, "&"),
        p => !(p.rlike("^(utm_[^=]*|fbclid|gclid|ref)=") || p === "")
      )
    )
    val qstr = array_join(kept, "&")
    concat(
      scheme,
      lit("://"),
      host(noFrag),
      path,
      when(length(qstr) > 0, concat(lit("?"), qstr)).otherwise(lit(""))
    )
  }
}
