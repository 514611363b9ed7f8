package graft.text

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end webtext preprocessing pass a training-data pipeline
  * runs before tokenization: language-ID + quality scoring + exact
  * dedup + near-dedup + token accounting, composed from the
  * individually-oracled operators into ONE call over the corpus.
  *
  * Drop semantics are deterministic and order-free (each stage is a
  * pure predicate over the WHOLE corpus, so no stage depends on
  * another's survivor set — the q67 oracle replays all of them in SQL
  * and intersects):
  *  - quality:   keep docs with `qualityScore >= minQuality`;
  *  - exact:     keep a doc iff its id is the MINIMUM id carrying its
  *               exact text (digest-keyed group, never raw text on the
  *               shuffle wire);
  *  - near-dup:  drop any doc that has a SMALLER near-duplicate
  *               neighbor under MinHash-LSH (est jaccard >= the LSH
  *               threshold) — the "keep the lowest-id member" rule;
  *               chains drop every non-minimal member (documented:
  *               b~a and c~b drop both b and c even if a !~ c).
  *
  * Scale shape: one corpus scan computes lang/quality/token columns
  * (pure codegen expressions); exact dedup shuffles a 32-byte digest;
  * the near-dup stage is the bucketed LSH candidate path (keys cross
  * the wire, never pairs); the final filters are anti-joins on the id.
  */
object CorpusPipeline {

  def clean(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minQuality: Double = 0.5
  ): DataFrame = {
    val base = TextOps
      .withLangId(docs, textCol, "lang")
      .withColumn("quality", TextOps.qualityScore(textCol))
      .withColumn("n_tokens", TextOps.tokenCount(col(textCol)).cast("long"))
      .withColumn("n_bpeish", TextOps.bpeishCount(textCol).cast("long"))
    // exact dedup: keeper id per content digest (Dedup.exact semantics)
    val keepers = docs
      .groupBy(sha2(col(textCol), 256).as("__digest"))
      .agg(min(col(idCol)).as("__keeper"))
    // near-dup: any doc appearing as the LARGER id of an LSH pair drops
    val nearDropped = Dedup
      .minHashLsh(docs, idCol, textCol)
      .select(col("id_b").as(idCol))
      .distinct()
    base
      .filter(col("quality") >= minQuality)
      .withColumn("__digest", sha2(col(textCol), 256))
      .join(keepers, "__digest")
      .filter(col(idCol) === col("__keeper"))
      .join(nearDropped, Seq(idCol), "left_anti")
      .select(col(idCol), col("lang"), col("quality"), col("n_tokens"), col("n_bpeish"))
  }
}
