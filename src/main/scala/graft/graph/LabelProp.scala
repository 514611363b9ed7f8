package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007) — linear-time
  * community detection over the web graph: every node starts as its
  * own label; each superstep it adopts the MOST FREQUENT label among
  * its neighbors. Densely linked page clusters (mirrors, template
  * families, link farms) converge to one label within a few
  * supersteps — the standard cheap community pass before per-cluster
  * dedup or spam scoring.
  *
  * Determinism (asynchronous LPA is famously order-dependent; this is
  * the synchronous, replayable variant): all nodes update from the
  * PREVIOUS round's labels, frequency ties break toward the SMALLEST
  * label, and isolated / no-inbound nodes keep their current label.
  * Labels are node ids (longs), so the argmax is an exact integer
  * struct-max — bit-identical across engines and partitionings.
  *
  * Scale shape per superstep: edges ⋈ labels on src (label relation
  * is NODE-sized, edges the big side) then TWO partial-aggregated
  * reductions — count by (dst, label), struct-max by dst. Lineage is
  * cut per round with `localCheckpoint`, same as [[PageRank]]; at
  * web scale the superstep cost is the edge shuffle, linear in |E|.
  */
object LabelProp {

  /** @param undirected symmetrize edges so labels flow both ways (the
    *                    usual community semantic); false propagates
    *                    along edge direction only.
    * @return (v, label) after `iters` supersteps.
    */
  def communities(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      undirected: Boolean = true
  ): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val fwd = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e = (if (undirected) fwd.union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
             else fwd).cache()
    val nodes = e.select(col("src").as("v")).union(e.select(col("dst").as("v"))).distinct().cache()
    var l = nodes.withColumn("label", col("v"))
    for (_ <- 1 to iters) {
      val freq = e
        .join(l.withColumnRenamed("v", "src"), "src")
        .groupBy(col("dst").as("v"), col("label"))
        .agg(count(lit(1)).as("c"))
      val best = freq
        .groupBy("v")
        .agg(max(struct(col("c"), (-col("label")).as("nl"), col("label").as("l"))).as("m"))
        .select(col("v"), col("m.l").as("new_label"))
      l = l
        .join(best, Seq("v"), "left")
        .select(col("v"), coalesce(col("new_label"), col("label")).as("label"))
        .localCheckpoint(true)
    }
    nodes.unpersist()
    e.unpersist()
    l
  }
}
