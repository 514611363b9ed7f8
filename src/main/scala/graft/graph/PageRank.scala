package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank (Brin & Page 1998) over an edge relation — the canonical
  * web-graph iteration behind crawl prioritization and link-spam
  * scoring.
  *
  * Fixed-point INTEGER arithmetic throughout: ranks live in
  * `scale`-units (micro-units by default) and every step is a floor
  * division — bit-identical across engines and partitionings, where
  * double summation would drift with Spark's partition-dependent
  * reduce order. The per-iteration recurrence
  *
  *   r'(v) = (15 · scale / 100) / N  +  85 · Σ_in floor(r(u)/deg(u)) / 100
  *
  * is one join (edges ⋈ ranks on src — rank and degree relations are
  * NODE-sized, edges the big side) and one partial-aggregated groupBy
  * on dst per iteration: the Pregel superstep as two exchanges. The
  * edge relation is re-read every iteration — cache it; the rank
  * lineage is cut with `localCheckpoint` each step so the plan stays
  * flat across any iteration count (an uncut 20-join lineage is the
  * classic iterative-Spark OOM). Dangling mass (out-degree-0 nodes)
  * is dropped, the standard simplification; nodes with no in-edges
  * keep the teleport term only.
  */
object PageRank {

  /** @return (v, rank) after `iters` supersteps, ranks in scale-units. */
  def ranks(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      scale: Long = 1000000L
  ): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).cache()
    val nodes = e.select(col("src").as("v")).union(e.select(col("dst").as("v"))).distinct().cache()
    val n = nodes.count()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val teleport = (15L * scale / 100L) / n
    var r = nodes.withColumn("rank", lit(scale / n))
    for (_ <- 1 to iters) {
      val sums = e
        .join(r.withColumnRenamed("v", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("v"), floor(col("rank") / col("deg")).cast("long").as("c"))
        .groupBy("v")
        .agg(sum(col("c")).as("s"))
      r = nodes
        .join(sums, Seq("v"), "left")
        .select(
          col("v"),
          (lit(teleport) + floor(lit(85L) * coalesce(col("s"), lit(0L)) / lit(100L)).cast("long")).as("rank"))
        .localCheckpoint(true)
    }
    nodes.unpersist()
    e.unpersist()
    r
  }

  /** Personalized PageRank (topic-sensitive: Haveliwala 2002): the
    * teleport mass returns ONLY to the seed set, so rank measures
    * endorsement reachable FROM the seeds — crawl scoring around
    * trusted hosts, related-page queries. Same fixed-point integer
    * discipline and per-superstep plan as [[ranks]]; the seed flag
    * rides the node relation, initial mass `scale/|S|` on seeds and 0
    * elsewhere.
    *
    * @return (v, rank) after `iters` supersteps, scale-units.
    */
  def personalized(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      iters: Int,
      scale: Long = 1000000L
  ): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).cache()
    val s = seeds.select(col(seedCol).as("v")).distinct()
    val nS = s.count()
    require(nS > 0, "personalized PageRank needs a non-empty seed set")
    val nodes = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v")))
      .union(s.select(col("v")))
      .distinct()
      .join(s.withColumn("is_seed", lit(true)), Seq("v"), "left")
      .select(col("v"), coalesce(col("is_seed"), lit(false)).as("is_seed"))
      .cache()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val base = when(col("is_seed"), lit((15L * scale / 100L) / nS)).otherwise(lit(0L))
    var r = nodes
      .select(col("v"), when(col("is_seed"), lit(scale / nS)).otherwise(lit(0L)).as("rank"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val sums = e
        .join(r.withColumnRenamed("v", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("v"), floor(col("rank") / col("deg")).cast("long").as("c"))
        .groupBy("v")
        .agg(sum(col("c")).as("s"))
      r = nodes
        .join(sums, Seq("v"), "left")
        .select(
          col("v"),
          (base + floor(lit(85L) * coalesce(col("s"), lit(0L)) / lit(100L)).cast("long")).as("rank"))
        .localCheckpoint(true)
    }
    nodes.unpersist()
    e.unpersist()
    r
  }
}
