package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting — the local clustering signal behind
  * community detection and link-spam heuristics on web graphs.
  *
  * Algorithm: canonicalize to UNDIRECTED edges oriented low→high
  * (`a < b`, self-loops dropped, duplicates collapsed), enumerate
  * wedges a<b<c by joining the oriented edge list with itself on the
  * middle vertex, and close each wedge against the edge list again —
  * every triangle is produced EXACTLY once (as its sorted vertex
  * triple), no /3 correction or symmetric blow-up. Three shuffles
  * total (dedup, wedge join, closing join), all partial-aggregated or
  * equi-joins on edge keys.
  *
  * Skew note for the 100-TB graph: id-orientation makes a high-degree
  * LOW id fan out its full degree² in wedges; the standard fix is
  * DEGREE-ordered orientation (orient toward the higher (deg, id)),
  * which bounds per-vertex fan-out by arboricity. Id-orientation is
  * kept here because the verdict must replay in the SQL oracle
  * verbatim; swap the comparator for the degree pair when pointing
  * this at a power-law graph.
  */
object Triangles {

  /** @return (v, n_tri): for every vertex of the undirected graph, the
    *         number of triangles it participates in.
    */
  def perNode(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .cache()
    val tri = e.alias("e1")
      .join(e.alias("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("wa"), col("e1.b").as("wb"), col("e2.b").as("wc"))
      .join(e.alias("e3"), col("wa") === col("e3.a") && col("wc") === col("e3.b"))
      .select(col("wa").as("a"), col("wb").as("b"), col("wc").as("c"))
    val nodes = e.select(col("a").as("v")).union(e.select(col("b").as("v"))).distinct()
    val counts = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("v"))
      .groupBy("v")
      .agg(count(lit(1)).as("n_tri"))
    val out = nodes
      .join(counts, Seq("v"), "left")
      .select(col("v"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
    out
  }
}
