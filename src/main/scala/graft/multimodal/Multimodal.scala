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
    * level generates identical rows.
    */
  def syntheticMedia(spark: SparkSession, n: Long): DataFrame = {
    val kind = element_at(
      array(lit("image"), lit("audio"), lit("video")),
      (pmod(col("id"), lit(3)) + 1).cast("int")
    )
    val payload = encode(
      concat_ws("", (0 until 16).map(i => md5(concat(col("id"), lit(i)))): _*),
      "UTF-8"
    ) // 512 deterministic bytes
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

  /** Batch feature extraction: one pass per partition, rows streamed
    * through the decoder (never collected). Output adds
    * `features array<float>`.
    */
  def extractFeatures(df: DataFrame, dim: Int = 64): DataFrame = {
    val schema = df.schema.add("features", ArrayType(FloatType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](r.fieldIndex("payload"))
        Row.fromSeq(r.toSeq :+ stubDecode(payload, dim).toSeq)
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

  /** Resize: metadata-level transform (a real impl would also re-encode
    * the payload; the stub keeps bytes opaque and rewrites the typed
    * metadata, which is what downstream partition/pruning logic sees).
    */
  def resize(df: DataFrame, maxWidth: Int): DataFrame = {
    val w = col("meta.width")
    val scale = when(w > maxWidth, lit(maxWidth) / w.cast("double")).otherwise(lit(1.0))
    df.withColumn(
      "meta",
      struct(
        least(w, lit(maxWidth)).cast("int").as("width"),
        floor(col("meta.height") * scale).cast("int").as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.duration_ms").as("duration_ms")
      )
    )
  }
}
