package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact mode: quantiles equal the exact rule below capacity") {
    // weights: value v appears v times, v in 1..10 -> total 55
    val df = (1 to 10).flatMap(v => Seq.fill(v)(v.toDouble)).toDF("v")
    val st = df.agg(QuantileSketch.sketch(col("v"), capacity = 64).as("s"))
    val got = st
      .select(
        QuantileSketch.quantile(col("s"), 0.5).as("p50"),
        QuantileSketch.quantile(col("s"), 0.95).as("p95"),
        QuantileSketch.quantile(col("s"), 0.0).as("p0"),
        QuantileSketch.quantile(col("s"), 1.0).as("p100")
      )
      .head()
    // cum weights: 1,3,6,10,15,21,28,36,45,55; targets 27.5 / 52.25
    assert(got.getDouble(0) == 7.0)
    assert(got.getDouble(1) == 10.0)
    assert(got.getDouble(2) == 1.0) // q=0: first centroid
    assert(got.getDouble(3) == 10.0)
  }

  test("exact mode: null values are ignored, empty input yields null quantile") {
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("v")
    val st = df.agg(QuantileSketch.sketch(col("v"), 16).as("s"))
    assert(st.select(QuantileSketch.quantile(col("s"), 1.0)).head().getDouble(0) == 3.0)
    val empty = Seq.empty[Option[Double]].toDF("v")
      .agg(QuantileSketch.sketch(col("v"), 16).as("s"))
    assert(empty.select(QuantileSketch.quantile(col("s"), 0.5)).head().isNullAt(0))
  }

  test("tier merge equals direct sketch in exact mode (merge-order-free)") {
    val ev = (0 until 600)
      .map(i => (i.toLong, s"2024-01-0${1 + i % 3}T0${i % 8}:0${i % 6}:00", (i % 97).toDouble))
      .toDF("id", "tss", "v")
      .select(col("id"), to_timestamp(col("tss")).as("ts"), col("v"))
    val t1m = Rollup.fromRaw(ev, Seq.empty, "ts", "1m", lit(0L), quantiles = Map("qs" -> col("v")))
    val t1h = Rollup.reRollup(t1m, Seq.empty, "1m" -> "1h", quantileCols = Seq("qs"))
    val t1d = Rollup.reRollup(t1h, Seq.empty, "1h" -> "1d", quantileCols = Seq("qs"))
    val viaTiers = t1d
      .select(col("bucket_ts"), QuantileSketch.quantile(col("qs"), 0.5).as("p50"))
      .collect()
      .map(r => r.getTimestamp(0) -> r.getDouble(1))
      .toMap
    val direct = Rollup
      .fromRaw(ev, Seq.empty, "ts", "1d", lit(0L), quantiles = Map("qs" -> col("v")))
      .select(col("bucket_ts"), QuantileSketch.quantile(col("qs"), 0.5).as("p50"))
      .collect()
      .map(r => r.getTimestamp(0) -> r.getDouble(1))
      .toMap
    assert(viaTiers == direct && viaTiers.size == 3)
  }

  test("above capacity: size bounded, rank error within N/capacity bins") {
    val n = 20000
    val df = (0 until n).map(_.toDouble).toDF("v")
    val st = df.agg(QuantileSketch.sketch(col("v"), capacity = 64).as("s"))
    val row = st
      .select(
        size(map_keys(col("s"))).as("sz"),
        QuantileSketch.quantile(col("s"), 0.5).as("p50"),
        QuantileSketch.quantile(col("s"), 0.9).as("p90")
      )
      .head()
    assert(row.getInt(0) <= 64)
    // each bin holds ~n/64 = 312 ranks; allow a few bins of slack for
    // merge-order effects across partitions
    assert(math.abs(row.getDouble(1) - 0.5 * n) <= 4.0 * n / 64, row.getDouble(1))
    assert(math.abs(row.getDouble(2) - 0.9 * n) <= 4.0 * n / 64, row.getDouble(2))
  }
}
