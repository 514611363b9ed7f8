package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTER formation — the step the pair-producing
  * operators (n-gram Jaccard, MinHash-LSH, SimHash, embedding LSH)
  * stop short of: a corpus dedup decision needs connected components
  * over the pair graph and one canonical representative per component
  * (keep the smallest id, drop the rest — the convention crawl dedup
  * pipelines use so the decision is deterministic and join-stable).
  *
  * Algorithm: hash-min label propagation — every node starts labeled
  * with its own id; each round, labels flow across edges and every
  * node keeps the minimum seen; fixpoint when no label changes. Each
  * round is ONE shuffle (edge join + min-aggregate) and the iterate is
  * `localCheckpoint`ed so the plan/lineage stays flat instead of
  * doubling per round. Rounds needed = the graph diameter, which for
  * near-dup clusters is small (duplicate groups are dense — mostly
  * stars around a popular page); the general mitigation for
  * long-chain graphs (alternating small-star/large-star, O(log n)
  * rounds — Kiveris et al., "Connected Components in MapReduce") is
  * noted, not built: for dedup graphs the constant factor of plain
  * hash-min wins. `maxIter` fails LOUDLY if the fixpoint isn't
  * reached — a silent partial clustering would under-dedup.
  *
  * The per-round driver action (the convergence check) reads one
  * aggregated count, never data.
  */
object Clusters {

  /** Connected components of the undirected graph given as an edge
    * list. Returns (id, component) for every node appearing in
    * `edges`, component = smallest node id in the component.
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 25
  ): DataFrame = {
    val e = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .localCheckpoint()
    var labels = e
      .select(col("a").as("id"))
      .distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // labels flow one hop: neighbor's current label lands on me
      val flowed = e
        .join(labels.withColumnRenamed("id", "a"), "a")
        .select(col("b").as("id"), col("comp"))
      val next = labels
        .union(flowed)
        .groupBy("id")
        .agg(min("comp").as("comp"))
        .localCheckpoint()
      val changed = next
        .join(labels.withColumnRenamed("comp", "prev"), "id")
        .filter(col("comp") =!= col("prev"))
        .count()
      labels = next
      converged = changed == 0L
      iter += 1
    }
    require(
      converged,
      s"Clusters.connectedComponents did not converge in $maxIter rounds — " +
        "the pair graph has a longer chain than near-dup graphs should; raise maxIter " +
        "or pre-split the graph"
    )
    labels
  }

  /** Corpus dedup decision from a pair list: every id in `pairs` gets
    * its component and a keep/drop flag (keep = the component's
    * smallest id). Ids never appearing in a pair are their own
    * canonical and are not returned (no work for the unaffected 99%).
    */
  def dedupDecision(pairs: DataFrame, srcCol: String, dstCol: String, maxIter: Int = 25): DataFrame =
    connectedComponents(pairs, srcCol, dstCol, maxIter)
      .withColumn("is_canonical", col("id") === col("comp"))
      .select(col("id"), col("comp").as("component"), col("is_canonical"))
}
