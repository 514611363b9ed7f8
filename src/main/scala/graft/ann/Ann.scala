package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Dot products and norms are built-in higher-order functions
  * (`zip_with` + `aggregate`), computed in double precision — no UDF,
  * stays in codegen, deterministic.
  *
  * Scale path: brute-force is the exactness baseline (queries are
  * broadcast, corpus scanned once, per-query top-k via aggregate-free
  * window on the small score relation). The LSH variant buckets the
  * corpus by random-hyperplane signatures so each query probes only its
  * bucket — corpus shuffle is by bucket key, and recall/cost trade via
  * the number of hyperplanes.
  */
object Ann {

  /** Double-precision dot product — the codegen'd native expression
    * (tight primitive loop; bit-identical to the HOF formulation
    * `aggregate(zip_with(a,b,_*_),0,_+_)` it replaced). The
    * `array<double>` cast is a no-op on pre-cast columns; callers on
    * the O(n²) pair paths pre-cast once per vector.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct(a.cast("array<double>"), b.cast("array<double>"))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force cosine top-k: for each query row (small set,
    * broadcast), rank the corpus by cosine similarity; emit
    * (query_id, neighbor_id, rank). Ranks are integers — stable under
    * reordering; ties break on ascending neighbor id.
    */
  def bruteForceTopK(
      corpus: DataFrame, // (id, embedding)
      queries: DataFrame, // (query_id, embedding)
      k: Int
  ): DataFrame = {
    // cast to double once per vector, not once per pair
    val q = queries.select(col("query_id"), col("embedding").cast("array<double>").as("q_emb"))
    val scored = corpus
      .select(col("id"), col("embedding").cast("array<double>").as("embedding"))
      .crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .withColumn("sim", cosine(col("embedding"), col("q_emb")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank").cast("long").as("rank"))
  }

  /** Embedding-cosine near-duplicate pairs: all (id_a < id_b) pairs
    * with cosine similarity >= threshold. Exactness baseline for
    * near-dup detection over embeddings; the self-join is the O(n^2)
    * truth path — at scale, `cosineNearDupPairsLsh` runs the same
    * rerank only within LSH buckets to keep candidate generation
    * linear. Norms are precomputed once per side so the pair loop does
    * one dot product, and the id inequality halves the pair space.
    */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    // pre-cast to double once per vector — the O(n^2) pair loop then
    // runs pure double multiply-adds (same bits as casting inside the
    // pair, so the similarity value is unchanged)
    val asDouble = transform(col("embedding"), x => x.cast("double"))
    val withNorm = emb.select(col("id"), asDouble.as("embedding"), norm(asDouble).as("nrm"))
    val a = withNorm.toDF("id_a", "emb_a", "nrm_a")
    val b = withNorm.toDF("id_b", "emb_b", "nrm_b")
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }

  /** All `tables * planes` hyperplane projections of an embedding in
    * ONE higher-order-function pass over a literal plane matrix.
    * Plane component (p, d) is a 31-bit LCG over the index, scaled to
    * [-1, 1) — integer arithmetic only, so any SQL engine reproduces
    * the planes bit-for-bit and the LSH oracles check algorithm
    * parity, not recall luck. The matrix is a LITERAL materialized at
    * plan-build time: per-element formula expressions made Catalyst
    * analysis/codegen the dominant cost of small bucket jobs.
    */
  private def allProjections(emb: Column, tables: Int, planes: Int, maxDim: Int): Column =
    // fused codegen loop over planes × dims with the LCG plane values
    // computed inline (see LshProjections — no plane literal rides the
    // task binary, and the width/null contract fails loudly)
    graft.functions.LshProjections(emb, tables * planes, maxDim)

  /** Probe the embedding width from one row (driver-side, one tiny
    * job). Falls back to 512 on an empty input so plans still build.
    */
  private def embeddingDim(df: DataFrame): Int =
    df.filter(col("embedding").isNotNull) // a null first row must not NPE the probe
      .select(size(col("embedding")))
      .head(1)
      .headOption
      .map(_.getInt(0))
      .getOrElse(512)

  /** (id, tb, key) bucket relation over `tables` independent LSH
    * tables — the shuffle-friendly candidate-generation shape: keys,
    * never pairs, cross the wire.
    */
  /** All XOR masks of Hamming weight <= `bits` over `planes` bit
    * positions, ascending (0 first = the exact bucket).
    */
  private[ann] def probeMasks(planes: Int, bits: Int): Seq[Int] =
    (0 until (1 << planes)).filter(m => Integer.bitCount(m) <= bits)

  private def bucketRelation(df: DataFrame, idName: String, tables: Int, planes: Int, maxDim: Int): DataFrame = {
    // A NULL embedding null-propagates through the projection
    // expression, which would turn every sign bit into 0 and dump the
    // row into bucket key 0 of EVERY table — a silent hot-bucket
    // O(n^2) hazard on null-heavy corpora. Null rows can never be
    // reranked anyway (cosine with null is null), so exclude them from
    // candidate generation entirely.
    val withProj = df
      .filter(col("embedding").isNotNull)
      .select(col(idName), allProjections(col("embedding"), tables, planes, maxDim).as("__proj"))
    val keys = (0 until tables).map { t =>
      val bits = (0 until planes).map { j =>
        when(element_at(col("__proj"), t * planes + j + 1) >= 0, shiftleft(lit(1), j)).otherwise(lit(0))
      }
      struct(lit(t).as("tb"), bits.reduce(_.bitwiseOR(_)).as("key"))
    }
    withProj
      .select(col(idName), explode(array(keys: _*)).as("bk"))
      .select(col(idName), col("bk.tb").as("tb"), col("bk.key").as("key"))
  }

  /** Multi-table LSH approximate top-k with query-side multi-probe:
    * `tables` independent sign-bucket tables of `planes` hyperplanes
    * each; a (query, doc) pair becomes a candidate when the doc's
    * bucket is within Hamming distance `probeBits` of the query's
    * bucket in ANY table, then each query reranks its candidate set
    * exactly. Multi-probe moves work from the CORPUS side (which at
    * 100 TB dominates: one bucket row per vector per table) to the
    * QUERY side (a few extra broadcast-side keys per query): per-table
    * hit probability rises from p^planes to P(Hamming <= probeBits)
    * under per-plane agreement p = 1 - angle/pi, so the same recall
    * needs HALF the tables of the probe-free config. See
    * SimilaritySpec for the measured recall on the test corpus.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      planes: Int = 6,
      tables: Int = 16,
      probeBits: Int = 2
  ): DataFrame = {
    // the corpus-side projection pass is the CPU-heavy stage — spread
    // a single-partition input across the cores (no-op at scale)
    val c = graft.spark.Spread
      .cpu(corpus)
      .select(col("id"), col("embedding").cast("array<double>").as("embedding"))
    val q = queries.select(col("query_id"), col("embedding").cast("array<double>").as("q_emb"))
    // size the plane matrix to the corpus dim (one-row probe): a
    // 512-wide literal matrix made the task binary megabytes and the
    // per-row interpreted projection pass 8x wider than needed. Rows
    // wider than the probed dim still fail loudly via the dim guard.
    val maxDim = embeddingDim(c)
    val cB = bucketRelation(c, "id", tables, planes, maxDim)
    val qB0 = bucketRelation(q.withColumnRenamed("q_emb", "embedding"), "query_id", tables, planes, maxDim)
    // probe expansion: every bucket key within Hamming distance
    // `probeBits` of the query's own key (tiny: |queries| * tables *
    // C(planes, <=probeBits) rows, all broadcast)
    val qB = qB0
      .select(
        col("query_id"),
        col("tb"),
        explode(array(probeMasks(planes, probeBits).map(m => col("key").bitwiseXOR(lit(m))): _*)).as("key")
      )
    val cand = cB
      .join(broadcast(qB), Seq("tb", "key"))
      .filter(col("id") =!= col("query_id"))
      .select("query_id", "id")
      .distinct()
    val scored = cand
      .join(c, "id")
      .join(broadcast(q), "query_id")
      .withColumn("sim", cosine(col("embedding"), col("q_emb")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank").cast("long").as("rank"), col("sim"))
  }

  /** Bucketed near-duplicate pairs — the 100-TB path for what
    * `cosineNearDupPairs` does all-pairs: `tables` independent LSH
    * sign-bucket tables of `planes` hyperplanes each generate
    * candidates (docs sharing any table's bucket), then ONLY
    * candidates get the exact cosine test against `threshold`. The
    * shuffle key is (table, bucket), never a doc pair, so candidate
    * generation is linear in corpus size + bucket collisions; recall
    * is the standard LSH union-of-tables probability
    * 1 - (1 - p^planes)^tables with p = 1 - θ/π (tune tables/planes
    * per corpus; see AnnSpec for the measured figure on the test
    * corpus). Precision is exact: every emitted pair passed the real
    * similarity test.
    */
  def cosineNearDupPairsLsh(
      emb: DataFrame,
      threshold: Double,
      tables: Int = 8,
      planes: Int = 4
  ): DataFrame = {
    val asDouble = transform(col("embedding"), x => x.cast("double"))
    val withNorm = graft.spark.Spread
      .cpu(emb)
      .select(col("id"), asDouble.as("emb"), norm(asDouble).as("nrm"))
      .cache()
    val bucketed =
      bucketRelation(
        withNorm.select(col("id"), col("emb").as("embedding")),
        "id",
        tables,
        planes,
        embeddingDim(withNorm.select(col("emb").as("embedding")))
      )

    val cand = bucketed
      .as("x")
      .join(bucketed.as("y"), Seq("tb", "key"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()

    val out = cand
      .join(withNorm.select(col("id").as("id_a"), col("emb").as("emb_a"), col("nrm").as("nrm_a")), "id_a")
      .join(withNorm.select(col("id").as("id_b"), col("emb").as("emb_b"), col("nrm").as("nrm_b")), "id_b")
      .withColumn("sim", dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
      .cache()
    out.count() // materialize so the norm cache can release
    withNorm.unpersist()
    out
  }

  /** Deterministic spherical k-means coarse quantizer — the trained
    * upgrade over ivfTopK's first-n centroid stand-in. The 100-TB
    * shape mirrors how FAISS trains an IVF index: fit centroids on a
    * bounded, hash-chosen sample (the collect is O(sampleN x dim) —
    * model-sized, independent of corpus size), then assign the full
    * corpus with the broadcast-centroid scan ivfTopK already does.
    * Lloyd's iterations run driver-side on the sorted sample:
    * sequential IEEE double math is bit-reproducible across runs,
    * partitionings and core counts, which is what lets a driver query
    * pin the trained centroids as SQL literals and have DuckDB replay
    * assignment + probe + rerank exactly (q63's oracle).
    *
    * Spherical variant: vectors are L2-normalized, assignment is by
    * max dot product (= cosine), a centroid is the renormalized mean
    * of its members. Ties break on the lowest centroid index; a
    * cluster that empties keeps its previous centroid (no random
    * resampling — determinism over Lloyd's-textbook purity).
    */
  /** Bounded, hash-chosen, unit-normalized training sample (zero
    * vectors dropped — they carry no direction). Order is the hash
    * order: deterministic across runs and partitionings.
    */
  private def normalizedSample(corpus: DataFrame, sampleN: Int, seed: Long): Array[Array[Double]] =
    corpus
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
      .select(col("id"), col("embedding").cast("array<double>").as("e"))
      .orderBy(xxhash64(col("id"), lit(seed)), col("id"))
      .limit(sampleN)
      .collect()
      .map(_.getSeq[Double](1).toArray)
      .flatMap { v =>
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n == 0.0) None else Some(v.map(_ / n))
      }

  def trainCentroids(
      corpus: DataFrame, // (id, embedding)
      nCentroids: Int,
      iters: Int = 10,
      sampleN: Int = 4096,
      seed: Long = 42L
  ): Array[Array[Double]] = {
    val vecs = normalizedSample(corpus, sampleN, seed)
    require(
      vecs.length >= nCentroids,
      s"k-means needs >= $nCentroids non-zero sample vectors, got ${vecs.length}"
    )
    val dim = vecs.head.length
    // farthest-point init (greedy, deterministic k-means++): first
    // centroid = first sample vector, each next = the vector with the
    // smallest max-cosine to the chosen set (ties -> lowest sample
    // index). A take(n) init can land all n seeds in one true cluster
    // and Lloyd's never recovers — measured recall 0.58 vs 0.90 on the
    // 10-cluster test corpus; farthest-point spreads seeds across
    // clusters by construction.
    val chosen = scala.collection.mutable.ArrayBuffer(vecs.head)
    val maxSim = vecs.map(v => { var d = 0.0; var i = 0; while (i < dim) { d += v(i) * vecs.head(i); i += 1 }; d })
    while (chosen.length < nCentroids) {
      var best = 0; var bestSim = Double.PositiveInfinity
      var r = 0
      while (r < vecs.length) {
        if (maxSim(r) < bestSim) { bestSim = maxSim(r); best = r }
        r += 1
      }
      val next = vecs(best)
      chosen += next
      r = 0
      while (r < vecs.length) {
        var d = 0.0; var i = 0
        while (i < dim) { d += vecs(r)(i) * next(i); i += 1 }
        if (d > maxSim(r)) maxSim(r) = d
        r += 1
      }
    }
    var cents = chosen.toArray.map(_.clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(nCentroids)(new Array[Double](dim))
      val counts = new Array[Long](nCentroids)
      vecs.foreach { v =>
        var best = 0; var bestDot = Double.NegativeInfinity
        var j = 0
        while (j < nCentroids) {
          var d = 0.0; var i = 0
          while (i < dim) { d += v(i) * cents(j)(i); i += 1 }
          if (d > bestDot) { bestDot = d; best = j } // ties keep lowest j
          j += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      cents = cents.zipWithIndex.map { case (old, j) =>
        val n = math.sqrt(sums(j).map(x => x * x).sum)
        if (counts(j) == 0 || n == 0.0) old else sums(j).map(_ / n)
      }
    }
    cents
  }

  /** IVF-style variant: coarse centroids = the `nCentroids` first
    * corpus vectors (deterministic) unless a trained quantizer is
    * passed (`trainCentroids`); every vector is assigned to its
    * nearest centroid, queries probe the `nprobe` nearest centroid
    * cells and rerank exactly within them.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nCentroids: Int = 16,
      nprobe: Int = 4,
      trained: Option[Array[Array[Double]]] = None
  ): DataFrame = {
    val centroids = trained match {
      case Some(cents) =>
        val spark = corpus.sparkSession
        import spark.implicits._
        cents.zipWithIndex
          .map { case (e, i) => (i.toLong, e.toSeq) }
          .toSeq
          .toDF("centroid_id", "c_emb")
      case None =>
        corpus
          .orderBy("id")
          .limit(nCentroids)
          .select(col("id").as("centroid_id"), col("embedding").as("c_emb"))
    }

    def assign(df: DataFrame, idColName: String, embCol: String, outCol: String, probes: Int): DataFrame = {
      val scored = df
        .crossJoin(broadcast(centroids))
        .withColumn("c_sim", cosine(col(embCol), col("c_emb")))
      val w = Window.partitionBy(col(idColName)).orderBy(col("c_sim").desc, col("centroid_id").asc)
      scored
        .withColumn("c_rank", row_number().over(w))
        .filter(col("c_rank") <= probes)
        .withColumnRenamed("centroid_id", outCol)
        .drop("c_emb", "c_sim", "c_rank")
    }

    val c = assign(corpus, "id", "embedding", "cell", 1)
    val q = assign(
      queries.select(col("query_id"), col("embedding").as("q_emb")),
      "query_id",
      "q_emb",
      "cell",
      nprobe
    )
    val scored = c
      .join(broadcast(q), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("sim", cosine(col("embedding"), col("q_emb")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank").cast("long").as("rank"), col("sim"))
  }

  /** Deterministic L2 Lloyd's over pre-extracted vectors: farthest-
    * point init (first vector, then max-min-distance, ties -> lowest
    * sample index), fixed iterations, empty cluster keeps its previous
    * centroid. Used per PQ subspace.
    */
  private def lloydL2(vecs: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    val dim = vecs.head.length
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val df = a(i) - b(i); s += df * df; i += 1 }
      s
    }
    val chosen = scala.collection.mutable.ArrayBuffer(vecs.head)
    val minDist = vecs.map(d2(_, vecs.head))
    while (chosen.length < k) {
      var best = 0; var bestD = Double.NegativeInfinity
      var r = 0
      while (r < vecs.length) {
        if (minDist(r) > bestD) { bestD = minDist(r); best = r }
        r += 1
      }
      val next = vecs(best)
      chosen += next
      r = 0
      while (r < vecs.length) {
        val d = d2(vecs(r), next)
        if (d < minDist(r)) minDist(r) = d
        r += 1
      }
    }
    var cents = chosen.toArray.map(_.clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      vecs.foreach { v =>
        var best = 0; var bestD = Double.PositiveInfinity
        var c = 0
        while (c < k) {
          val d = d2(v, cents(c))
          if (d < bestD) { bestD = d; best = c } // ties keep lowest c
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old else sums(c).map(_ / counts(c))
      }
    }
    cents
  }

  /** Deterministic product-quantization codebook: split the (unit-
    * normalized) embedding into `m` subspaces of `dim / m` components
    * and run plain L2 Lloyd's per subspace on the bounded hash-chosen
    * sample. Returns the codebook flattened as
    * `[(s * kCodes + c) * dsub + j]` — the layout `PqEncode` and the
    * q66 oracle index into. Driver-side sequential math: bit-
    * reproducible, so the oracle can pin the codebook as literals.
    *
    * On unit vectors, L2 distance ranks identically to cosine
    * (|a-b|^2 = 2 - 2 cos), so the PQ scores approximate the same
    * geometry every other ANN path here uses.
    */
  def trainPq(
      corpus: DataFrame, // (id, embedding)
      m: Int = 8,
      kCodes: Int = 16,
      iters: Int = 10,
      sampleN: Int = 4096,
      seed: Long = 42L
  ): Array[Double] = {
    val vecs = normalizedSample(corpus, sampleN, seed)
    require(vecs.length >= kCodes, s"PQ needs >= $kCodes non-zero sample vectors, got ${vecs.length}")
    val dim = vecs.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    val out = new Array[Double](m * kCodes * dsub)
    (0 until m).foreach { s =>
      val sub = vecs.map(_.slice(s * dsub, (s + 1) * dsub))
      val cents = lloydL2(sub, kCodes, iters)
      var c = 0
      while (c < kCodes) {
        System.arraycopy(cents(c), 0, out, (s * kCodes + c) * dsub, dsub)
        c += 1
      }
    }
    out
  }

  /** PQ-only approximate top-k (asymmetric distance computation): the
    * corpus is stored as `m` sub-codes per vector (32x smaller than
    * the raw floats at m=8, k=16 over 64 dims — THE memory lever at
    * 100 TB), each query precomputes its m x kCodes distance lookup
    * table driver-side (queries are small by contract), and scoring is
    * m table lookups per candidate. Ranks ascend by approximate
    * distance, ties on ascending id. Exactness baseline stays
    * `bruteForceTopK`.
    *
    * `rerank > 0` adds the production second stage: the PQ scores cut
    * the corpus to a `rerank`-sized shortlist per query, and ONLY the
    * shortlist re-reads true vectors for an exact cosine rerank — the
    * full scan touches m-byte codes, never floats (measured recall@10
    * on the test corpus: 0.33 PQ-only, 0.70 with a 50-vector rerank,
    * 0.88 with 100 — a 20% float-read budget; SimilaritySpec).
    */
  def pqTopK(
      corpus: DataFrame, // (id, embedding)
      queries: DataFrame, // (query_id, embedding)
      k: Int,
      codebook: Array[Double],
      m: Int = 8,
      kCodes: Int = 16,
      rerank: Int = 0
  ): DataFrame = {
    val dsub = codebook.length / (m * kCodes)
    val c0 = corpus
      .select(col("id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("nrm", norm(col("e")))
      .filter(col("nrm") > 0)
      .select(col("id"), transform(col("e"), x => x / col("nrm")).as("e"))
    val codes = c0.select(col("id"), graft.functions.PqEncode(col("e"), codebook, m, kCodes, dsub).as("codes"))
    val qRows = queries
      .select(col("query_id"), col("embedding").cast("array<double>").as("e"))
      .orderBy("query_id")
      .collect()
    val luts = qRows.flatMap { r =>
      val qid = r.getLong(0)
      val e = r.getSeq[Double](1).toArray
      val n = math.sqrt(e.map(x => x * x).sum)
      if (n == 0.0) None
      else {
        val v = e.map(_ / n)
        val lut = new Array[Double](m * kCodes)
        var s = 0
        while (s < m) {
          var c = 0
          while (c < kCodes) {
            var d = 0.0; var j = 0
            while (j < dsub) {
              val diff = v(s * dsub + j) - codebook((s * kCodes + c) * dsub + j)
              d += diff * diff
              j += 1
            }
            lut(s * kCodes + c) = d
            c += 1
          }
          s += 1
        }
        Some((qid, lut.toSeq))
      }
    }
    val spark = corpus.sparkSession
    import spark.implicits._
    val lutDf = luts.toSeq.toDF("query_id", "lut")
    val adist = aggregate(
      transform(
        sequence(lit(0), lit(m - 1)),
        s => element_at(col("lut"), s * lit(kCodes) + element_at(col("codes"), s + lit(1)) + lit(1))
      ),
      lit(0.0),
      (acc, x) => acc + x
    )
    val scored = codes
      .crossJoin(broadcast(lutDf))
      .filter(col("id") =!= col("query_id"))
      .withColumn("adist", adist)
    val w = Window.partitionBy("query_id").orderBy(col("adist").asc, col("id").asc)
    val pqRanked = scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= (if (rerank > 0) rerank else k))
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank").cast("long").as("rank"), col("adist"))
    if (rerank == 0) pqRanked
    else {
      // exact second stage over the shortlist only: true vectors are
      // read for |queries| * rerank rows, not the corpus
      val q = queries.select(col("query_id"), col("embedding").cast("array<double>").as("q_emb"))
      val cand = pqRanked.select(col("query_id"), col("neighbor_id").as("id"))
      val exact = cand
        .join(corpus.select(col("id"), col("embedding").cast("array<double>").as("embedding")), "id")
        .join(broadcast(q), "query_id")
        .withColumn("sim", cosine(col("embedding"), col("q_emb")))
      val w2 = Window.partitionBy("query_id").orderBy(col("sim").desc, col("id").asc)
      exact
        .withColumn("rank", row_number().over(w2))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("id").as("neighbor_id"), col("rank").cast("long").as("rank"), col("sim"))
    }
  }

  /** IVF-PQ composed — the production 100-TB ANN shape: the stored
    * index row is (id, cell, codes) — an int cell and m sub-codes per
    * vector, no floats. A query probes its `nprobe` nearest IVF cells,
    * ADC-scores ONLY those cells' codes (m table lookups per
    * candidate), shortlists `rerank` per query, and re-reads true
    * vectors for the exact rerank of the shortlist alone. Cell
    * assignment matches ivfTopK's trained path (cosine on raw vectors)
    * and encoding matches pqTopK (unit-normalized subvector L2), so
    * the q69 oracle replays both models end to end.
    */
  def ivfPqTopK(
      corpus: DataFrame, // (id, embedding)
      queries: DataFrame, // (query_id, embedding)
      k: Int,
      centroids: Array[Array[Double]],
      codebook: Array[Double],
      m: Int = 8,
      kCodes: Int = 16,
      nprobe: Int = 2,
      rerank: Int = 50
  ): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val dsub = codebook.length / (m * kCodes)
    val centDf = centroids.zipWithIndex
      .map { case (e, i) => (i.toLong, e.toSeq) }
      .toSeq
      .toDF("centroid_id", "c_emb")
    // index build: one corpus pass -> (id, cell, codes)
    val c0 = corpus
      .select(col("id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("nrm", norm(col("e")))
      .filter(col("nrm") > 0)
      .select(col("id"), col("e"), transform(col("e"), x => x / col("nrm")).as("v"))
    val wc = Window.partitionBy("id").orderBy(col("c_sim").desc, col("centroid_id").asc)
    val codes = c0
      .crossJoin(broadcast(centDf))
      .withColumn("c_sim", cosine(col("e"), col("c_emb")))
      .withColumn("r", row_number().over(wc))
      .filter(col("r") === 1)
      .select(
        col("id"),
        col("centroid_id").as("cell"),
        graft.functions.PqEncode(col("v"), codebook, m, kCodes, dsub).as("codes")
      )
    // query side: nprobe cells + the ADC lookup table, all broadcast
    val q0 = queries.select(col("query_id"), col("embedding").cast("array<double>").as("q_emb"))
    val wq = Window.partitionBy("query_id").orderBy(col("c_sim").desc, col("centroid_id").asc)
    val probes = q0
      .crossJoin(broadcast(centDf))
      .withColumn("c_sim", cosine(col("q_emb"), col("c_emb")))
      .withColumn("r", row_number().over(wq))
      .filter(col("r") <= nprobe)
      .select(col("query_id"), col("centroid_id").as("cell"))
    val luts = q0.orderBy("query_id").collect().flatMap { r =>
      val qid = r.getLong(0)
      val e = r.getSeq[Double](1).toArray
      val n = math.sqrt(e.map(x => x * x).sum)
      if (n == 0.0) None
      else {
        val v = e.map(_ / n)
        val lut = new Array[Double](m * kCodes)
        var s = 0
        while (s < m) {
          var c = 0
          while (c < kCodes) {
            var d = 0.0; var j = 0
            while (j < dsub) {
              val diff = v(s * dsub + j) - codebook((s * kCodes + c) * dsub + j)
              d += diff * diff
              j += 1
            }
            lut(s * kCodes + c) = d
            c += 1
          }
          s += 1
        }
        Some((qid, lut.toSeq))
      }
    }
    val qSide = probes.join(luts.toSeq.toDF("query_id", "lut"), "query_id")
    val adist = aggregate(
      transform(
        sequence(lit(0), lit(m - 1)),
        s => element_at(col("lut"), s * lit(kCodes) + element_at(col("codes"), s + lit(1)) + lit(1))
      ),
      lit(0.0),
      (acc, x) => acc + x
    )
    val scored = codes
      .join(broadcast(qSide), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("adist", adist)
    val ws = Window.partitionBy("query_id").orderBy(col("adist").asc, col("id").asc)
    val short = scored
      .withColumn("r", row_number().over(ws))
      .filter(col("r") <= rerank)
      .select(col("query_id"), col("id"))
    val exact = short
      .join(corpus.select(col("id"), col("embedding").cast("array<double>").as("embedding")), "id")
      .join(broadcast(q0), "query_id")
      .withColumn("sim", cosine(col("embedding"), col("q_emb")))
    val wk = Window.partitionBy("query_id").orderBy(col("sim").desc, col("id").asc)
    exact
      .withColumn("rank", row_number().over(wk))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank").cast("long").as("rank"), col("sim"))
  }
}
