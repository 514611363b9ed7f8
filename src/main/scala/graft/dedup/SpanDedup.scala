package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact substring-span deduplication: find every k-token span that
  * repeats across documents (Lee et al., "Deduplicating Training Data
  * Makes Language Models Better", ACL 2022 — the suffix-array ExactSubstr
  * method, re-expressed as a distributed sliding-window hash join).
  * Unlike document-level Jaccard/MinHash (q14/q22), this catches long
  * boilerplate passages embedded in otherwise-distinct pages — the
  * dominant duplication mode in web crawl text.
  *
  * Position-indexed k-token windows (NOT deduplicated per doc —
  * positions are the output) are hashed with the repo's SQL-replayable
  * md5-prefix scheme; spans whose hash occurs in >= minDocs distinct
  * docs are emitted with their occurrence coordinates, ready for
  * span-cut filtering.
  *
  * Scale shape: one explode (size - k + 1 windows per doc), one
  * partial-aggregated exchange keyed by span hash for the group stats,
  * and one shuffle hash join back on the hash to attach coordinates —
  * the wire carries (id, pos, hash) triples and (hash, stats) rows,
  * never text. A span shared by h docs re-joins h rows per occurrence
  * list — inherent output size. 60-bit hashes: collisions ~ n^2/2^61;
  * at 10^12 spans use the 2-column (hash, len) key or verify emitted
  * groups exactly (the oracle uses the identical hash, so parity holds
  * regardless).
  */
object SpanDedup {

  /** One row per occurrence of a cross-doc repeated k-token span:
    * (id, pos, span_hash, n_docs, n_occ); pos is the 0-based token
    * offset of the window.
    */
  def repeatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      minDocs: Int = 2
  ): DataFrame = {
    val occ = graft.spark.Spread
      .cpu(df)
      .select(col(idCol).cast("long").as("id"), split(col(textCol), " ").as("t"))
      .filter(size(col("t")) >= k)
      .select(
        col("id"),
        explode(
          expr(
            s"""transform(sequence(0, size(t) - $k),
                          i -> struct(cast(i as long) as pos,
                                      cast(conv(substring(md5(array_join(slice(t, i + 1, $k), ' ')), 1, 15),
                                                16, 10) as bigint) as span_hash))"""
          )
        ).as("w")
      )
      .select(col("id"), col("w.pos").as("pos"), col("w.span_hash").as("span_hash"))

    val groups = occ
      .groupBy("span_hash")
      .agg(countDistinct(col("id")).as("n_docs"), count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= minDocs)

    occ.join(groups, Seq("span_hash")).select("id", "pos", "span_hash", "n_docs", "n_occ")
  }

  /** Template-opening detection: group documents by their first-k-token
    * prefix — the anchored special case of span dedup that catches
    * templated pages ("Welcome to ... | Home | Products ...") whose
    * bodies diverge after a shared generated opening. Cheaper than full
    * span dedup (ONE window per doc, not size-k+1) and the natural
    * first pass before it.
    *
    * @return one row per prefix shared by >= minDocs distinct docs:
    *         (prefix_hash, n_docs, min_id) — min_id is the canonical
    *         exemplar to keep.
    *
    * Scale shape: a pure projection to (id, hash) then one
    * partial-aggregated exchange keyed by the prefix hash; text never
    * crosses the wire.
    */
  def prefixGroups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      minDocs: Int = 2
  ): DataFrame =
    graft.spark.Spread
      .cpu(df)
      .select(col(idCol).cast("long").as("id"), split(col(textCol), " ").as("t"))
      .filter(size(col("t")) >= k)
      .select(
        col("id"),
        expr(
          s"""cast(conv(substring(md5(array_join(slice(t, 1, $k), ' ')), 1, 15),
                        16, 10) as bigint)"""
        ).as("prefix_hash")
      )
      .groupBy("prefix_hash")
      .agg(countDistinct(col("id")).as("n_docs"), min(col("id")).as("min_id"))
      .filter(col("n_docs") >= minDocs)
}
