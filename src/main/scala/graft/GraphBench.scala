package graft

import graft.graph.{Bfs, LabelProp, PageRank, Triangles}
import graft.spark.Sessions
import org.apache.spark.sql.functions._

/** Scale check for the graph operators: the driver fixtures run on the
  * 500-doc table, so this main stresses the SAME code on a synthetic
  * graph 4000× larger (pure-codegen `range()` generation — no I/O in
  * the measurement), local[32]. Prints one JSON line.
  *
  * Env: SPARK_GRAFT_GRAPH_NODES (default 2,000,000; 3 out-edges per
  * node ⇒ 6M directed edges), SPARK_GRAFT_GRAPH_CORES (default 32).
  */
object GraphBench {

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_GRAPH_NODES", "2000000").toLong
    val cores = sys.env.getOrElse("SPARK_GRAFT_GRAPH_CORES", "32").toInt
    val spark = Sessions.build(s"local[$cores]", "graft-graphbench")
    spark.sparkContext.setLogLevel("WARN")

    val edges = spark
      .range(n)
      .select(col("id").as("src"), explode(array(lit(1), lit(2), lit(3))).as("j"))
      .select(col("src"), pmod(col("src") * 7 + col("j") * 13, lit(n)).as("dst"))

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val (prRows, prSec) = time {
      PageRank.ranks(edges, "src", "dst", iters = 8).count()
    }
    val (triRows, triSec) = time {
      Triangles.perNode(edges, "src", "dst").count()
    }
    val seeds = spark.range(n).filter(pmod(col("id"), lit(1999)) === 0).select(col("id").as("v"))
    val (bfsRows, bfsSec) = time {
      Bfs.levels(edges, "src", "dst", seeds, "v", maxDepth = 3).count()
    }
    val (lpRows, lpSec) = time {
      LabelProp.communities(edges, "src", "dst", iters = 3).count()
    }

    val e = 3L * n
    println(
      s"""{"metric":"graph_bench","nodes":$n,"edges":$e,"cores":$cores,""" +
        s""""pagerank8_sec":${f"$prSec%.2f"},"pagerank_edge_traversals_per_sec":${(e * 8 / prSec).toLong},""" +
        s""""triangles_sec":${f"$triSec%.2f"},"bfs3_sec":${f"$bfsSec%.2f"},"labelprop3_sec":${f"$lpSec%.2f"},""" +
        s""""pagerank_rows":$prRows,"triangle_rows":$triRows,"bfs_rows":$bfsRows,"labelprop_rows":$lpRows}""")
    spark.stop()
  }
}
