package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS — hubs and authorities (Kleinberg 1999), the link-analysis
  * complement to [[PageRank]]: authorities are pointed AT by good
  * hubs, hubs point TO good authorities. Web use: seed-quality scoring
  * for focused crawls, where PageRank measures global endorsement.
  *
  * Same execution discipline as PageRank: INTEGER fixed-point (scores
  * in `scale`-units) so every iteration is bit-reproducible across
  * engines and partitionings. One HITS round is
  *
  *   a'(v) = Σ_{u→v} h(u)        (edges ⋈ hubs, reduce on dst)
  *   h'(u) = Σ_{u→v} a'(v)       (edges ⋈ auths, reduce on src)
  *
  * followed by max-normalization `x ← x·scale / max(x)` (floor) — the
  * max rides a 1-row broadcast cross-join, NOT a driver action, so a
  * round is four exchanges and zero collects. Score lineage is cut
  * with `localCheckpoint` per round. Nodes missing a side (no
  * in-edges / no out-edges) hold score 0 on that side.
  */
object Hits {

  /** @return (v, auth, hub) after `iters` rounds, scores in
    *         scale-units (max node = `scale` on each side).
    */
  def scores(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      scale: Long = 1000000L
  ): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).cache()
    val nodes = e.select(col("src").as("v")).union(e.select(col("dst").as("v"))).distinct().cache()

    def normalized(scores: DataFrame, c: String): DataFrame = {
      val mx = scores.agg(max(col(c)).as("__mx"))
      scores
        .crossJoin(broadcast(mx))
        .select(col("v"), floor(col(c) * lit(scale) / col("__mx")).cast("long").as(c))
    }

    var h = nodes.withColumn("hub", lit(scale))
    var a: DataFrame = null
    for (_ <- 1 to iters) {
      val aRaw = e
        .join(h.withColumnRenamed("v", "src"), "src")
        .groupBy(col("dst").as("v"))
        .agg(sum(col("hub")).as("auth"))
      a = nodes
        .join(normalized(aRaw, "auth"), Seq("v"), "left")
        .select(col("v"), coalesce(col("auth"), lit(0L)).as("auth"))
        .localCheckpoint(true)
      val hRaw = e
        .join(a.withColumnRenamed("v", "dst"), "dst")
        .groupBy(col("src").as("v"))
        .agg(sum(col("auth")).as("hub"))
      h = nodes
        .join(normalized(hRaw, "hub"), Seq("v"), "left")
        .select(col("v"), coalesce(col("hub"), lit(0L)).as("hub"))
        .localCheckpoint(true)
    }
    val out = a.join(h, "v").select(col("v"), col("auth"), col("hub"))
    nodes.unpersist()
    e.unpersist()
    out
  }
}
