package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, plus decode /
  * feature-extract / resize / frame-sample operators.
  *
  * The Spark-side shape is real and tested — schema, batch-oriented
  * partition processing (`mapPartitions` over row iterators, the Scala
  * analogue of `mapInPandas` batches), partitioning, output columns.
  * The actual codec call is STUBBED with a deterministic fake (this
  * container ships no image/audio libraries): see [[stubDecode]] —
  * swap that single function for a real decoder (e.g. JNI/javacv) to
  * productionize; everything around it stays unchanged.
  */
object Multimodal {

  val MetaType: StructType = StructType(
    Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType)
    )
  )

  /** Deterministic synthetic media table `(media_id, kind, payload,
    * meta)` — payload bytes derived from the id, so any parallelism
    * level generates identical rows. With `ppmImages`, image-kind rows
    * carry a REAL decodable 8×8 P6 PPM: the fixed header plus 192
    * ASCII-hex bytes (the md5 stream) as RGB values — so the decode
    * path runs on genuine image bytes while staying byte-reproducible
    * in SQL (the oracle rebuilds the same string).
    */
  def syntheticMedia(spark: SparkSession, n: Long, ppmImages: Boolean = false): DataFrame = {
    val kind = element_at(
      array(lit("image"), lit("audio"), lit("video")),
      (pmod(col("id"), lit(3)) + 1).cast("int")
    )
    val stream = concat_ws("", (0 until 16).map(i => md5(concat(col("id"), lit(i)))): _*)
    val raw = // 512 deterministic bytes
      if (!ppmImages) stream
      else
        when(kind === "image", concat(lit("P6\n8 8\n255\n"), substring(stream, 1, 192)))
          .otherwise(stream)
    val payload = encode(raw, "UTF-8")
    spark
      .range(n)
      .select(
        col("id").as("media_id"),
        kind.as("kind"),
        payload.as("payload"),
        struct(
          (pmod(col("id"), lit(8)) * 160 + 320).cast("int").as("width"),
          (pmod(col("id"), lit(8)) * 90 + 180).cast("int").as("height"),
          lit(16000).as("sample_rate"),
          (pmod(col("id"), lit(60)) * 1000 + 1000).as("duration_ms")
        ).as("meta")
      )
  }

  /** STUB decoder: a real implementation would decode the payload with
    * an image/audio library and emit a feature vector; this fake
    * derives `dim` floats deterministically from the payload bytes so
    * the pipeline shape (batched partition iteration, fixed-width
    * float output, no driver collect) is fully exercised.
    */
  private def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = h * 31 + payload(i); i += 1 }
    var d = 0
    while (d < dim) {
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17 // xorshift
      out(d) = ((h % 2000001L) / 1000000.0f) - 1.0f
      d += 1
    }
    out
  }

  /** Pure-JVM decoder for binary (P6) PPM: `P6` magic, whitespace-
    * separated width/height/maxval, ONE whitespace byte, then
    * `w*h*3` RGB bytes. No comment support (the synthetic writer never
    * emits comments); anything malformed returns None and falls back
    * to the stub. Returns (width, height, maxval, pixels 0..maxval).
    */
  def decodePpm(payload: Array[Byte]): Option[(Int, Int, Int, Array[Int])] = {
    if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6') return None
    var pos = 2
    def readInt(): Int = {
      while (pos < payload.length && Character.isWhitespace(payload(pos))) pos += 1
      val st = pos
      while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') pos += 1
      // malformed (no digits) or absurd (overflow-risk) tokens -> -1,
      // so the caller's None path fires instead of NumberFormatException
      if (pos == st || pos - st > 9) -1 else new String(payload, st, pos - st).toInt
    }
    val w = readInt(); val h = readInt(); val mv = readInt()
    pos += 1 // the single whitespace after maxval
    // pixel-count math in Long: w*h*3 must not overflow Int into a
    // negative bound that lets the length guard pass
    if (w <= 0 || h <= 0 || mv <= 0 || mv > 255) return None
    val need = w.toLong * h * 3
    if (need > Int.MaxValue - pos || payload.length < pos + need) return None
    val px = new Array[Int](w * h * 3)
    var i = 0
    while (i < px.length) { px(i) = payload(pos + i) & 0xff; i += 1 }
    Some((w, h, mv, px))
  }

  /** Average-pool a decoded image to a g×g grayscale grid
    * (g = sqrt(dim)): per cell, the INTEGER sum of the (r+g+b) values
    * of its pixel block (exact — the oracle checks these), and the
    * float feature `sum / (blockPixels * 3 * maxval)` in [0, 1].
    * None when `dim` is not a square dividing the image grid.
    */
  private def poolGray(w: Int, h: Int, mv: Int, px: Array[Int], dim: Int): Option[(Array[Float], Array[Long])] = {
    val g = math.sqrt(dim.toDouble).toInt
    if (g * g != dim || w % g != 0 || h % g != 0) return None
    val bw = w / g
    val bh = h / g
    val sums = new Array[Long](dim)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cell = (y / bh) * g + (x / bw)
        val base = (y * w + x) * 3
        sums(cell) += px(base) + px(base + 1) + px(base + 2)
        x += 1
      }
      y += 1
    }
    val denom = bw.toDouble * bh * 3 * mv
    Some((sums.map(s => (s / denom).toFloat), sums))
  }

  /** Batch feature extraction: one pass per partition, rows streamed
    * through the decoder (never collected). Payloads that parse as
    * binary PPM get REAL pixel-derived features (pooled grayscale);
    * everything else (audio/video — no codec libraries in this
    * container) falls back to the deterministic stub. Output adds
    * `features array<float>` and, with `withGraySums`, the exact
    * integer pooled sums (`gray_sums array<bigint>`, null for
    * non-image payloads) for engine-parity checking.
    */
  def extractFeatures(df: DataFrame, dim: Int = 64, withGraySums: Boolean = false): DataFrame = {
    val base = df.schema.add("features", ArrayType(FloatType))
    val schema = if (withGraySums) base.add("gray_sums", ArrayType(LongType)) else base
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](r.fieldIndex("payload"))
        val decoded = decodePpm(payload).flatMap { case (w, h, mv, px) => poolGray(w, h, mv, px, dim) }
        val (features, sums) = decoded match {
          case Some((f, s)) => (f.toSeq, s.toSeq)
          case None         => (stubDecode(payload, dim).toSeq, null)
        }
        Row.fromSeq(if (withGraySums) r.toSeq :+ features :+ sums else r.toSeq :+ features)
      }
    }(enc)
  }

  /** Frame sampling: slice the payload into fixed-size "frames" and
    * keep every `everyN`-th — pure expressions (`slice`/`sequence`),
    * exercising the explode fan-out shape of real video sampling.
    */
  def frameSample(df: DataFrame, frameBytes: Int = 64, everyN: Int = 4): DataFrame = {
    val nFrames = floor(length(col("payload")) / frameBytes).cast("int")
    df.withColumn("__n_frames", nFrames)
      .filter(col("__n_frames") > 0)
      .withColumn(
        "frame_idx",
        explode(expr(s"filter(sequence(0, __n_frames - 1), i -> i % $everyN = 0)"))
      )
      .withColumn(
        "frame",
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)")
      )
      .drop("__n_frames")
  }

  /** Average-pool a decoded PPM down to `maxWidth` columns and
    * re-encode as binary P6. Integer-factor pooling only: the source
    * width must be a multiple of `maxWidth` and the height a multiple
    * of the factor (matching the pooled-feature grid semantics);
    * per-channel output byte = floor(mean of the block's bytes).
    * None when the payload is not PPM, already narrow enough, or not
    * factor-divisible (callers fall back to the metadata-only path).
    */
  def resizePpm(payload: Array[Byte], maxWidth: Int): Option[(Array[Byte], Int, Int)] =
    decodePpm(payload).flatMap { case (w, h, mv, px) =>
      if (w <= maxWidth) None
      else {
        val f = w / maxWidth
        if (w % maxWidth != 0 || h % f != 0) None
        else {
          val nh = h / f
          val out = new Array[Byte](maxWidth * nh * 3)
          var y = 0
          while (y < nh) {
            var x = 0
            while (x < maxWidth) {
              var c = 0
              while (c < 3) {
                var s = 0
                var dy = 0
                while (dy < f) {
                  var dx = 0
                  while (dx < f) { s += px(((y * f + dy) * w + (x * f + dx)) * 3 + c); dx += 1 }
                  dy += 1
                }
                out((y * maxWidth + x) * 3 + c) = (s / (f * f)).toByte
                c += 1
              }
              x += 1
            }
            y += 1
          }
          val header = s"P6\n$maxWidth $nh\n$mv\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
          Some((header ++ out, maxWidth, nh))
        }
      }
    }

  /** Resize: PPM payloads are REALLY transcoded (average-pool
    * downsample + P6 re-encode via [[resizePpm]], metadata rewritten
    * from the actual new dimensions); everything else — audio/video,
    * non-divisible or already-narrow images — keeps its bytes opaque
    * and gets the metadata-level rewrite only (which is what
    * downstream partition/pruning logic sees). Same batched
    * partition-iteration shape as [[extractFeatures]].
    */
  def resize(df: DataFrame, maxWidth: Int): DataFrame = {
    val schema = df.schema
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val pIx = schema.fieldIndex("payload")
    val mIx = schema.fieldIndex("meta")
    // meta fields resolved BY NAME against the frame's own struct
    // schema (callers may order/extend the struct differently)
    val metaType = schema(mIx).dataType.asInstanceOf[StructType]
    val wIx = metaType.fieldIndex("width")
    val hIx = metaType.fieldIndex("height")
    df.mapPartitions { rows =>
      rows.map { r =>
        val meta = r.getStruct(mIx)
        // no metadata or no dimensions -> nothing to resize
        if (meta == null || meta.isNullAt(wIx) || meta.isNullAt(hIx)) r
        else {
          val (w0, h0) = (meta.getInt(wIx), meta.getInt(hIx))
          val vals = r.toSeq.toArray
          val metaVals = meta.toSeq.toArray
          val payload = if (r.isNullAt(pIx)) null else r.getAs[Array[Byte]](pIx)
          (if (payload == null) None else resizePpm(payload, maxWidth)) match {
            case Some((bytes, nw, nh)) =>
              vals(pIx) = bytes
              metaVals(wIx) = nw
              metaVals(hIx) = nh
            case None =>
              val scale = if (w0 > maxWidth) maxWidth.toDouble / w0 else 1.0
              metaVals(wIx) = math.min(w0, maxWidth)
              metaVals(hIx) = math.floor(h0 * scale).toInt
          }
          vals(mIx) = Row.fromSeq(metaVals.toIndexedSeq)
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
    }(enc)
  }
}
