package graft.ann

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quality gates for the approximate similarity paths. Every LSH/IVF
  * operator is verified twice: the driver oracle checks ALGORITHM
  * parity (an independent SQL engine computes identical output), and
  * these tests pin the RECALL of the approximation against the exact
  * baselines on the deterministic test corpus — so a parameter change
  * that silently degrades quality fails the build even though parity
  * still holds.
  */
class SimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val emb = spark.read
    .parquet(s"$dir/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding"))
    .cache()

  private lazy val queries =
    emb.filter(col("id") < 5).select(col("id").as("query_id"), col("embedding"))

  private def pairRecall(exact: DataFrame, approx: DataFrame, cols: Seq[String]): Double = {
    val e = exact.select(cols.map(col): _*)
    val a = approx.select(cols.map(col): _*)
    val hit = e.intersect(a).count().toDouble
    hit / e.count()
  }

  test("a null embedding in the corpus does not break the dim probe") {
    val withNull = emb
      .withColumn("embedding", when(col("id") === emb.agg(min("id")).head().getLong(0), lit(null)).otherwise(col("embedding")))
    // plan construction probes the dim from the first non-null row
    val out = Ann.lshTopK(withNull, queries, k = 3)
    assert(out.count() > 0)
  }

  test("multi-table LSH top-k: recall >= 0.7 vs brute force") {
    val exact = Ann.bruteForceTopK(emb, queries, k = 10)
    val approx = Ann.lshTopK(emb, queries, k = 10)
    val r = pairRecall(exact, approx, Seq("query_id", "neighbor_id"))
    assert(r >= 0.7, s"lshTopK recall $r")
  }

  test("IVF top-k: recall >= 0.8 vs brute force") {
    val exact = Ann.bruteForceTopK(emb, queries, k = 10)
    val approx = Ann.ivfTopK(emb, queries, k = 10)
    val r = pairRecall(exact, approx, Seq("query_id", "neighbor_id"))
    assert(r >= 0.8, s"ivfTopK recall $r")
  }

  test("LSH near-dup pairs: exact precision, recall >= 0.6 vs all-pairs") {
    val exact = Ann.cosineNearDupPairs(emb, threshold = 0.4).cache()
    val approx = Ann.cosineNearDupPairsLsh(emb, threshold = 0.4).cache()
    // precision is 1.0 by construction (every candidate passes the
    // real similarity test) — the approximation only loses pairs
    assert(approx.select("id_a", "id_b").except(exact.select("id_a", "id_b")).isEmpty)
    val r = pairRecall(exact, approx, Seq("id_a", "id_b"))
    assert(r >= 0.6, s"near-dup LSH recall $r")
  }

  test("MinHash-LSH at est>=0.5 finds exactly the true jaccard>=0.5 pairs on this corpus") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val exact = Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("id_a", "id_b")
    val approx = Dedup.minHashLsh(docs, "doc_id", "text").select("id_a", "id_b")
    assert(exact.except(approx).isEmpty && approx.except(exact).isEmpty)
  }
}
