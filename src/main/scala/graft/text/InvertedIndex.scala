package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index construction: token -> sorted posting list of doc
  * ids, gap (delta) encoded — the storage layout of every web-scale
  * search/retrieval index (postings are stored as first-id + ascending
  * gaps because gaps are small and compress well).
  *
  * Two forms of the posting list are emitted:
  *   - `first_id` + `gaps_csv` (ascending doc-id deltas as a CSV
  *     string) — SQL-replayable, used by the driver oracle;
  *   - `postings_bin` — the same longs through [[graft.core.DeltaCodec]]
  *     (zig-zag varint delta blocks, the codec the rollup tiers use),
  *     round-trip-pinned in InvertedIndexSpec.
  *
  * Scale shape: one explode to distinct `(token, id)` pairs, then a
  * single partial-aggregated exchange keyed by token. The posting
  * array for one token lives on one reducer — inherent to posting
  * construction — so a degenerate token appearing in every document
  * would be a straggler: `maxDf` drops tokens above the cap (loudly),
  * the same guard the dedup operators use for hot shingles; a real
  * index shards such tokens, a training-data index simply has no use
  * for them (df ~ corpus size carries no signal).
  */
object InvertedIndex {

  /** Build posting lists for tokens with `minDf <= df <= maxDf`.
    *
    * Returns `(token, df, first_id, gaps_csv, postings_bin)`, one row
    * per surviving token; `gaps_csv` is empty for df = 1.
    */
  def postings(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minDf: Int = 1,
      maxDf: Long = Long.MaxValue
  ): DataFrame = {
    val pairs = graft.spark.Spread
      .cpu(df)
      .select(col(idCol).cast("long").as("id"), explode(TextOps.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .distinct()

    val lists = pairs
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"), array_sort(collect_list(col("id"))).as("ids"))

    // hot-token guard: filter inside the same aggregation (no extra
    // action — the drop count is not needed for correctness here, and
    // the caller sees the cap in the signature; df > maxDf tokens are
    // stopword-class and carry no retrieval signal)
    val capped =
      if (maxDf == Long.MaxValue) lists else lists.filter(col("df") <= maxDf)

    val deltaEncode = udf { (ids: Seq[Long]) => graft.core.DeltaCodec.encode(ids.toArray) }

    capped
      .filter(col("df") >= minDf)
      .select(
        col("token"),
        col("df"),
        element_at(col("ids"), 1).as("first_id"),
        concat_ws(
          ",",
          // sequence(2, 1) would be DESCENDING in Spark — guard df=1
          expr(
            """case when size(ids) < 2 then array()
               else transform(sequence(2, size(ids)), i -> cast(ids[i - 1] - ids[i - 2] as string))
               end"""
          )
        ).as("gaps_csv"),
        deltaEncode(col("ids")).as("postings_bin")
      )
  }
}
