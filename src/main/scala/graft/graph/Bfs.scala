package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS levels — hop distance from a seed set over a
  * directed graph: crawl-depth assignment from seed hosts, blast-
  * radius queries on dependency graphs.
  *
  * Level-synchronous frontier expansion (the Pregel BFS): the visited
  * relation starts as the seeds at level 0; each round joins the
  * CURRENT FRONTIER (only the rows discovered last round — the join
  * input shrinks as the search saturates, it is never the full
  * visited set) against the edge list, anti-joins out already-visited
  * vertices, and unions the survivors in at level k. Two shuffles per
  * round on the frontier size; visited/frontier lineage is cut per
  * round with `localCheckpoint`. Rounds stop early when the frontier
  * empties. Vertices unreached within `maxDepth` are ABSENT from the
  * result (join back against the vertex relation for an explicit
  * unreachable marker).
  */
object Bfs {

  /** @return (v, level): minimum hop count from any seed, 0 for the
    *         seeds themselves, up to `maxDepth`.
    */
  def levels(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      maxDepth: Int
  ): DataFrame = {
    require(maxDepth >= 0, s"maxDepth must be >= 0, got $maxDepth")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).cache()
    var visited = seeds.select(col(seedCol).as("v")).distinct()
      .withColumn("level", lit(0L)).localCheckpoint(true)
    var frontier = visited
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      depth += 1
      frontier = frontier
        .join(e, frontier("v") === e("src"))
        .select(col("dst").as("v"))
        .distinct()
        .join(visited, Seq("v"), "left_anti")
        .withColumn("level", lit(depth.toLong))
        .localCheckpoint(true)
      visited = visited.unionByName(frontier).localCheckpoint(true)
    }
    e.unpersist()
    visited
  }
}
