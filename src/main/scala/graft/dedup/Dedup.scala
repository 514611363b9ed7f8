package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline: exact,
  * word-n-gram Jaccard, MinHash+LSH, SimHash. All hashing is seeded
  * `xxhash64` (Catalyst-native, codegen'd) so results are deterministic
  * across parallelism levels.
  *
  * Scale notes: exact dedup is one hash aggregate on a text digest
  * (never the raw text at scale); MinHash/LSH shuffles (band, bucket)
  * keys instead of doc pairs, so candidate generation is linear in
  * corpus size + bucket collisions, never the O(n^2) pair join;
  * n-gram Jaccard is reserved for verifying candidate pairs or small
  * corpora.
  */
object Dedup {

  /** Exact dedup: group rows by content digest; keep the minimum id as
    * the canonical copy. Returns (keeper id, n_copies) per distinct
    * content.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("digest"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select("keeper_id", "n_copies")

  /** Distinct word n-gram (shingle) relation: (id, shingle). */
  def shingles(df0: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    // shingle fan-out + downstream hashing is the CPU-heavy pass —
    // spread a single-partition input across the cores (no-op at scale)
    val df = graft.spark.Spread.cpu(df0)
    val toks = split(col(textCol), " ")
    // n-gram via transform over the token index range (built-in HOF)
    val grams =
      if (n == 1) toks
      else
        expr(
          s"""case when size(split($textCol, ' ')) < $n then array_repeat('', 0)
              else transform(
                sequence(0, size(split($textCol, ' ')) - $n),
                i -> array_join(slice(split($textCol, ' '), i + 1, $n), ' ')) end"""
        )
    df.select(col(idCol).as("id"), explode(grams).as("shingle")).distinct()
  }

  /** Exact n-gram Jaccard near-duplicate pairs. Emits integer overlap
    * and union sizes (exact, order-free) plus the pair ids, for pairs
    * with jaccard >= threshold and id_a < id_b.
    *
    * `maxShingleDf` is the scale guard on the shingle self-join: that
    * join is quadratic in per-shingle document frequency, so ONE
    * boilerplate phrase shared by a million docs would join 10^12
    * rows. Shingles with document frequency above the cap are dropped
    * from the shingle space BEFORE sizes and overlap are computed
    * (standard near-dup practice — an ultra-common shingle carries no
    * dedup signal), and the drop is logged loudly. Pairs whose shared
    * shingles all sit below the cap are exact. Default disables the
    * cap (verify-path semantics); any at-scale caller must set it.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxShingleDf: Long = Long.MaxValue
  ): DataFrame = {
    val sh0 = shingles(df, idCol, textCol, n)
    val sh =
      if (maxShingleDf == Long.MaxValue) sh0
      else {
        // the hot set is tiny by construction (shingles above the cap);
        // cache + count it once so the loud-drop check neither
        // recomputes the shingle aggregation inside the pair join (the
        // anti-join would re-run it during the main action) nor touches
        // the main plan at all when nothing binds — the common case
        // stays byte-identical to the uncapped plan
        val hot = sh0
          .groupBy("shingle")
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > maxShingleDf)
          .select("shingle")
          .cache()
        val nHot = hot.count()
        if (nHot == 0) { hot.unpersist(); sh0 }
        else {
          org.slf4j.LoggerFactory
            .getLogger(getClass)
            .warn(
              s"ngramJaccardPairs: dropping $nHot shingle(s) with document frequency > $maxShingleDf " +
                "before the pair join (hot-shingle scale guard); pairs connected only by dropped " +
                "shingles will not be emitted"
            )
          // no broadcast hint: the hot-set size is corpus-dependent
          // (boilerplate-heavy corpora can exceed the driver budget) —
          // AQE picks broadcast when the cached size allows
          sh0.join(hot, Seq("shingle"), "left_anti")
        }
      }
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("set_size"))
    val a = sh.withColumnRenamed("id", "id_a")
    val b = sh.withColumnRenamed("id", "id_b")
    val inter = a
      .join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("overlap"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("set_size", "size_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("set_size", "size_b"), "id_b")
      .withColumn("union_size", col("size_a") + col("size_b") - col("overlap"))
      .filter(col("overlap").cast("double") / col("union_size") >= threshold)
      .select("id_a", "id_b", "overlap", "union_size")
  }

  /** ASYMMETRIC shingle containment `C(A→B) = |S(A)∩S(B)| / |S(A)|` —
    * the near-dup relation Jaccard misses by construction: a short
    * document fully quoted inside a long one (press release inside an
    * article, answer inside a scrape of the whole thread, page inside
    * its boilerplate wrapper) has near-total containment but tiny
    * Jaccard, because the union is dominated by the long side. The
    * standard asymmetric-dedup primitive (Broder's containment, the
    * basis of "quote detection" passes in webtext pipelines).
    *
    * Emits ORDERED pairs (id_a contained in id_b) with exact integer
    * overlap / set sizes; `containment` is their one float division.
    * Same hot-shingle DF-cap contract as [[ngramJaccardPairs]] — the
    * pair join is quadratic in shingle document frequency, so
    * at-scale callers must set `maxShingleDf`.
    */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxShingleDf: Long = Long.MaxValue
  ): DataFrame = {
    val sh0 = shingles(df, idCol, textCol, n)
    val sh =
      if (maxShingleDf == Long.MaxValue) sh0
      else {
        val hot = sh0
          .groupBy("shingle")
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > maxShingleDf)
          .select("shingle")
          .cache()
        val nHot = hot.count()
        if (nHot == 0) { hot.unpersist(); sh0 }
        else {
          org.slf4j.LoggerFactory
            .getLogger(getClass)
            .warn(
              s"containmentPairs: dropping $nHot shingle(s) with document frequency > $maxShingleDf " +
                "before the pair join (hot-shingle scale guard)"
            )
          sh0.join(hot, Seq("shingle"), "left_anti")
        }
      }
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("set_size"))
    val inter = sh
      .withColumnRenamed("id", "id_a")
      .join(sh.withColumnRenamed("id", "id_b"), Seq("shingle"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("overlap"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("set_size", "size_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("set_size", "size_b"), "id_b")
      .withColumn("containment", col("overlap").cast("double") / col("size_a"))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "overlap", "size_a", "size_b", "containment")
  }

  /** Prime modulus of the affine minhash family. */
  val MinHashP: Long = 1000000007L

  /** Engine-portable 60-bit shingle hash: md5 hex prefix parsed as an
    * integer, reduced mod `MinHashP`. Chosen over `xxhash64` so an
    * independent SQL engine (the DuckDB oracle) reproduces the EXACT
    * same minhash values — the LSH output is verified by algorithm
    * parity, not by recall luck.
    */
  private def shingleHash: Column =
    pmod(
      expr("cast(conv(substring(md5(shingle), 1, 15), 16, 10) as bigint)"),
      lit(MinHashP)
    )

  /** The i-th affine minhash function: (a_i * H + b_i) mod P with
    * small deterministic coefficients (exact in 64-bit integers).
    */
  private def affineMin(i: Int): Column =
    min(pmod(lit(131L * i + 7L) * shingleHash + lit(1000003L * i + 12345L), lit(MinHashP)))

  /** MinHash signatures: `numHashes` affine hash functions over the
    * md5-derived shingle hash; per doc and hash function keep the
    * minimum. One explode + one aggregate — the signature never leaves
    * the executor as raw shingles. Returns (id, sig: array<bigint>).
    */
  def minHashSignatures(sh: DataFrame, numHashes: Int): DataFrame = {
    val hashes = (0 until numHashes).map(i => affineMin(i).as(s"h$i"))
    sh.groupBy("id")
      .agg(hashes.head, hashes.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** MinHash + LSH candidate pairs: signatures split into `bands` bands
    * of `rowsPerBand` hashes; docs sharing any band bucket become
    * candidates. The bucket key is the minhash slice itself (no second
    * hash), so the whole pipeline is reproducible by any engine with
    * md5 + integer arithmetic. Returns distinct (id_a < id_b)
    * candidate pairs with the estimated jaccard (signature agreement
    * fraction).
    */
  def minHashLsh(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      estThreshold: Double = 0.5
  ): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sh = shingles(df, idCol, textCol, shingleN)
    val sig = minHashSignatures(sh, numHashes).cache()

    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"), slice(col("sig"), b * rowsPerBand + 1, rowsPerBand).as("bucket"))
    }
    val buckets = sig
      .select(col("id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))

    val cand = buckets
      .as("x")
      .join(buckets.as("y"), Seq("band", "bucket"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()

    // estimate jaccard from signature agreement
    val sigA = sig.select(col("id").as("id_a"), col("sig").as("sig_a"))
    val sigB = sig.select(col("id").as("id_b"), col("sig").as("sig_b"))
    val agree = (0 until numHashes)
      .map(i => when(element_at(col("sig_a"), i + 1) === element_at(col("sig_b"), i + 1), 1).otherwise(0))
      .reduce(_ + _)
    cand
      .join(sigA, "id_a")
      .join(sigB, "id_b")
      .withColumn("est_jaccard", agree.cast("double") / numHashes)
      .filter(col("est_jaccard") >= estThreshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** LSH index relation for INCREMENTAL dedup: one row per (id, band)
    * carrying the band's bucket key and the doc's full signature. A
    * minhash signature depends only on the document itself (never the
    * corpus), so this relation is appendable: at scale it is the state
    * you persist as a day-partitioned snapshot table (`SnapshotStore`)
    * keyed by (band, bucket), and each day's increment probes it
    * instead of recomputing history.
    */
  def lshIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 4
  ): DataFrame = {
    val sh = shingles(df, idCol, textCol, shingleN)
    val sig = minHashSignatures(sh, bands * rowsPerBand)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"), slice(col("sig"), b * rowsPerBand + 1, rowsPerBand).as("bucket"))
    }
    sig
      .select(col("id"), col("sig"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("sig"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
  }

  /** Incremental MinHash-LSH: dedup a NEW batch against the existing
    * index without touching historical text. Emits exactly the
    * batch-mode pairs that involve at least one batch document — an
    * unordered pair is emitted exactly once across a batch sequence
    * (when its later member arrives), so folding batches B1..Bk yields
    * EXACTLY `minHashLsh(B1 ∪ ... ∪ Bk)`: signatures are per-doc, so
    * the candidate set and the signature-agreement estimate are
    * identical to the batch run (q64's oracle IS the batch SQL).
    *
    * Scale shape: the join probes the index on (band, bucket) — keys
    * cross the wire, never pairs, and only the increment's buckets are
    * on the build side. Returns (pairs, batch index rows); the caller
    * appends the new rows to the stored index.
    */
  def minHashLshIncrement(
      prevIndex: Option[DataFrame],
      batch: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      estThreshold: Double = 0.5
  ): (DataFrame, DataFrame) = {
    val numHashes = bands * rowsPerBand
    val newIdx = lshIndex(batch, idCol, textCol, shingleN, bands, rowsPerBand)
    val all = prevIndex.map(_.unionByName(newIdx)).getOrElse(newIdx)
    val cand = newIdx
      .as("x")
      .join(all.as("y"), Seq("band", "bucket"))
      .filter(col("x.id") =!= col("y.id"))
      .select(least(col("x.id"), col("y.id")).as("id_a"), greatest(col("x.id"), col("y.id")).as("id_b"))
      .distinct()
    // one signature row per id without a dedup shuffle: band 0 exists
    // for every indexed doc
    val sigs = all.filter(col("band") === 0).select(col("id"), col("sig"))
    val agree = (0 until numHashes)
      .map(i => when(element_at(col("sig_a"), i + 1) === element_at(col("sig_b"), i + 1), 1).otherwise(0))
      .reduce(_ + _)
    val pairs = cand
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("est_jaccard", agree.cast("double") / numHashes)
      .filter(col("est_jaccard") >= estThreshold)
      .select("id_a", "id_b", "est_jaccard")
    (pairs, newIdx)
  }

  /** 64-bit SimHash over whitespace tokens: per bit, sum +/-1 votes of
    * the token-hash bit; sign forms the fingerprint. Pure expressions
    * via explode + conditional sums (no UDF). Token bits come from two
    * 60-bit md5 hex prefixes (bits 0-31 from the first, 32-63 from the
    * second) — like the minhash family, engine-portable integer
    * arithmetic so the DuckDB oracle reproduces fingerprints exactly.
    */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("tok"))
    val h1 = expr("cast(conv(substring(md5(tok), 1, 15), 16, 10) as bigint)")
    val h2 = expr("cast(conv(substring(md5(tok), 16, 15), 16, 10) as bigint)")
    val bitVotes = (0 until 64).map { i =>
      val (h, sh) = if (i < 32) (h1, i) else (h2, i - 32)
      sum(when(shiftright(h, sh).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    val votes = tok.groupBy("id").agg(bitVotes.head, bitVotes.tail: _*)
    val fp = (0 until 64)
      .map(i => when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    votes.select(col("id"), fp.as("simhash"))
  }

  /** SimHash near-dup pairs within `maxHamming` via 16-bit band
    * blocking (pairs must agree on at least one of four 16-bit bands —
    * guaranteed when hamming distance <= 3 < 4 bands).
    */
  def simHashPairs(fps: DataFrame, maxHamming: Int = 3): DataFrame = {
    val bands = (0 until 4).map { b =>
      struct(lit(b).as("band"), shiftright(col("simhash"), b * 16).bitwiseAND(0xffffL).as("key"))
    }
    val blocked = fps
      .select(col("id"), col("simhash"), explode(array(bands: _*)).as("bk"))
      .select(col("id"), col("simhash"), col("bk.band").as("band"), col("bk.key").as("key"))
    val hamming = bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
    blocked
      .as("x")
      .join(blocked.as("y"), Seq("band", "key"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"), hamming.as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
