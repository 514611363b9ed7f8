package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.syntheticMedia(spark, 300L).cache()

  test("synthetic media has the contract schema and is deterministic") {
    val s = media.schema
    assert(s("payload").dataType.typeName == "binary")
    assert(s("meta").dataType.typeName == "struct")
    val a = media.repartition(1).select("media_id", "kind").collect().toSet
    val b = Multimodal.syntheticMedia(spark, 300L).repartition(5).select("media_id", "kind").collect().toSet
    assert(a == b)
  }

  test("feature extraction streams partitions and emits fixed-width float vectors") {
    val f = Multimodal.extractFeatures(media, dim = 32)
    assert(f.schema("features").dataType.simpleString == "array<float>")
    val sizes = f.select(size(col("features"))).distinct().collect().map(_.getInt(0)).toSeq
    assert(sizes == Seq(32))
    // deterministic across parallelism
    val x = Multimodal.extractFeatures(media.repartition(1), 8)
      .select("media_id", "features").collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val y = Multimodal.extractFeatures(media.repartition(7), 8)
      .select("media_id", "features").collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(x == y)
  }

  test("PPM decode: golden 2x2 image, pooled features, malformed fallback") {
    // hand-built 2x2 P6: pixels (10,20,30) (40,50,60) / (70,80,90) (100,110,120)
    val px = Array(10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120).map(_.toByte)
    val ppm = "P6\n2 2\n255\n".getBytes("UTF-8") ++ px
    val Some((w, h, mv, pixels)) = Multimodal.decodePpm(ppm)
    assert(w == 2 && h == 2 && mv == 255)
    assert(pixels.toSeq == Seq(10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120))
    // signed-byte handling: values > 127 survive as unsigned
    val hot = "P6\n1 1\n255\n".getBytes("UTF-8") ++ Array(0xff.toByte, 0x80.toByte, 0x00.toByte)
    assert(Multimodal.decodePpm(hot).get._4.toSeq == Seq(255, 128, 0))
    // malformed: wrong magic, truncated data
    assert(Multimodal.decodePpm("P5\n2 2\n255\n".getBytes("UTF-8") ++ px).isEmpty)
    assert(Multimodal.decodePpm("P6\n4 4\n255\n".getBytes("UTF-8") ++ px).isEmpty)
  }

  test("image rows get real pooled-grayscale features; audio/video stay stubbed") {
    val m = Multimodal.syntheticMedia(spark, 30L, ppmImages = true)
    val out = Multimodal.extractFeatures(m, dim = 16, withGraySums = true)
      .select("media_id", "kind", "features", "gray_sums")
      .collect()
    for (r <- out) {
      val kind = r.getString(1)
      val feats = r.getSeq[Float](2)
      assert(feats.size == 16)
      if (kind == "image") {
        val sums = r.getSeq[Long](3)
        assert(sums.size == 16)
        // feature = sum / (2*2 pixels * 3 channels * 255), exactly
        assert(feats.zip(sums).forall { case (f, s) => f == (s / (4.0 * 3 * 255)).toFloat })
        // ASCII-hex pixel bytes are 48..57 / 97..102 -> sums bounded
        assert(sums.forall(s => s >= 12L * 48 && s <= 12L * 102))
      } else assert(r.isNullAt(3))
    }
  }

  test("frame sampling slices payload into every-Nth fixed-size frame") {
    val frames = Multimodal.frameSample(media, frameBytes = 64, everyN = 4)
    // payload is 512 bytes -> 8 frames -> indices 0,4 kept
    val perDoc = frames.groupBy("media_id").count().select("count").distinct().collect().map(_.getLong(0)).toSeq
    assert(perDoc == Seq(2))
    val lens = frames.select(length(col("frame"))).distinct().collect().map(_.getInt(0)).toSeq
    assert(lens == Seq(64))
  }

  test("resize clamps width and scales height in typed metadata") {
    val r = Multimodal.resize(media, maxWidth = 640)
    assert(r.filter(col("meta.width") > 640).count() == 0)
    val one = r.filter(col("media_id") === 7).select("meta.width", "meta.height").head()
    // id 7: width 7%8*160+320 = 1440 -> 640; height 7%8*90+180 = 810 -> floor(810*640/1440)=360
    assert(one.getInt(0) == 640 && one.getInt(1) == 360)
  }

  test("resize REALLY transcodes PPM payloads: 2x2 average pooling, byte-exact") {
    val m = Multimodal.syntheticMedia(spark, 30L, ppmImages = true).filter(col("kind") === "image")
    val r = Multimodal.resize(m, maxWidth = 4)
    val orig = m.filter(col("media_id") === 0).head()
    val row = r.filter(col("media_id") === 0).head()
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(meta.getInt(0) == 4 && meta.getInt(1) == 4)
    val Some((w, h, mv, px)) = Multimodal.decodePpm(row.getAs[Array[Byte]](row.fieldIndex("payload")))
    assert(w == 4 && h == 4 && mv == 255)
    val Some((ow, _, _, opx)) = Multimodal.decodePpm(orig.getAs[Array[Byte]](orig.fieldIndex("payload")))
    for (y <- 0 until 4; x <- 0 until 4; c <- 0 until 3) {
      val s = (for (dy <- 0 to 1; dx <- 0 to 1) yield opx(((2 * y + dy) * ow + (2 * x + dx)) * 3 + c)).sum
      assert(px((y * 4 + x) * 3 + c) == s / 4)
    }
    // pooled hex-digit bytes stay ASCII-range: md5 parity with a
    // string-built oracle is sound
    assert(px.forall(v => v >= 48 && v <= 102))
  }

  test("decodePpm returns None on absurd headers instead of throwing") {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    // oversized dimension token (would NumberFormatException naively)
    assert(Multimodal.decodePpm("P6\n99999999999 8\n255\nxxx".getBytes(ascii)).isEmpty)
    // w*h*3 overflows Int (46341^2*3 < 0) — must not pass the length guard
    assert(Multimodal.decodePpm("P6\n46341 46341\n255\nxxx".getBytes(ascii)).isEmpty)
  }

  test("resize tolerates null payloads and null dimensions") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(
      Seq(
        StructField("media_id", LongType),
        StructField("payload", BinaryType),
        StructField("meta", Multimodal.MetaType)
      )
    )
    val rows = java.util.Arrays.asList(
      Row(1L, null, Row(1280, 720, 0, 0L)),              // null payload -> metadata-only path
      Row(2L, Array[Byte](1, 2, 3), Row(null, 720, 0, 0L)), // null width -> untouched
      Row(3L, Array[Byte](1, 2, 3), null)                // null meta -> untouched
    )
    val df = spark.createDataFrame(rows, schema)
    val out = Multimodal.resize(df, maxWidth = 640).collect().sortBy(_.getLong(0))
    assert(out(0).getStruct(2).getInt(0) == 640) // clamped despite null payload
    assert(out(1).getStruct(2).isNullAt(0))      // null width preserved
    assert(out(2).isNullAt(2))                   // null meta preserved
  }

  test("resize falls back to the metadata-only rewrite when pooling does not divide") {
    val m = Multimodal.syntheticMedia(spark, 30L, ppmImages = true).filter(col("kind") === "image")
    val before = m.select(col("media_id"), md5(col("payload")).as("h")).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val r = Multimodal.resize(m, maxWidth = 3) // 8 % 3 != 0 -> no transcode
    val after = r.select(col("media_id"), md5(col("payload")).as("h")).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(before == after)
    assert(r.filter(col("meta.width") > 3).count() == 0)
  }
}
