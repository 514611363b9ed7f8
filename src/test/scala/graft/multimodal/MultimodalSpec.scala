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
}
