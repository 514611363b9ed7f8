package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Redirect-chain resolution by POINTER DOUBLING — the crawl-graph
  * primitive behind canonical-URL resolution (301 chains, shortener
  * hops, mirror ladders): given a redirect map src→dst, find every
  * source's FINAL target (the first node with no outgoing redirect).
  *
  * The naive walk joins once per HOP — a length-L chain costs L
  * rounds. Pointer doubling squares the reach each round
  * (`t' (x) = t(t(x))`), so L hops resolve in ⌈log2 L⌉ rounds: the
  * classic parallel list-ranking trick, and on Spark each round is
  * ONE self-join of the node-sized pointer relation — 4 rounds cover
  * chains of 16, 10 rounds cover 1024. At web scale redirect chains
  * are short (browsers cap ~20), so resolution is a constant ~5
  * joins regardless of corpus size.
  *
  * Determinism: the map must be FUNCTIONAL — one outgoing redirect
  * per src (a multi-valued src would fan out rows in the self-join;
  * callers dedupe upstream). Cycles never reach a sink and surface as
  * `resolved = false` rather than hanging (the naive walk would loop
  * forever).
  */
object Pointers {

  /** @return (srcCol, final_<dstCol>, resolved): the target after up
    *         to 2^rounds hops; `resolved` is false when the pointer
    *         still lands on a redirecting node (chain longer than
    *         2^rounds, or a cycle).
    */
  def resolveChains(redirects: DataFrame, srcCol: String, dstCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 20, s"rounds must be in [1,20], got $rounds")
    var t = redirects.select(col(srcCol).as("src"), col(dstCol).as("nxt"))
    for (_ <- 1 to rounds) {
      val hop = t.select(col("src").as("__s2"), col("nxt").as("__n2"))
      t = t
        .join(hop, t("nxt") === hop("__s2"), "left")
        .select(col("src"), coalesce(col("__n2"), col("nxt")).as("nxt"))
        .localCheckpoint(true)
    }
    val stillRedirects = redirects.select(col(srcCol).as("__rsrc")).distinct()
    t.join(stillRedirects, t("nxt") === stillRedirects("__rsrc"), "left")
      .select(
        col("src").as(srcCol),
        col("nxt").as(s"final_$dstCol"),
        col("__rsrc").isNull.as("resolved")
      )
  }
}
