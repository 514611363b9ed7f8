package graft.rollup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tiered rollup / downsample engine.
  *
  * A rollup row is keyed `(series..., bucket_ts)` and carries the
  * associative measures `point_count` and `byte_size` plus optional
  * decimal value sums and a `lang_hist` map. Associativity is the load-
  * bearing property: every coarser tier is a re-aggregation of the next
  * finer tier (`1m -> 1h -> 1d -> 30d`), so raw data is scanned exactly
  * once no matter how many tiers exist, and the re-agg inputs shrink
  * geometrically (SURVEY.md §2.10).
  *
  * Scale notes: the only shuffle per tier is the hash aggregation on
  * `(series, bucket)`; partial (map-side) aggregation collapses each
  * input partition to its distinct series×bucket combinations before
  * the exchange. Skewed hot series are handled upstream by bucketing/
  * salting (see `graft.pages.PagePartitioning`) and AQE skew handling.
  */
object Rollup {

  /** Raw rows -> finest tier. `sizeCol` feeds byte_size (pass
    * `lit(0L)` when there is no payload column); `valueSums` are extra
    * `name -> column` sums (use exact decimal inputs for oracle-stable
    * results); `langCol` adds a `lang_hist` map when set.
    */
  def fromRaw(
      df: DataFrame,
      series: Seq[String],
      tsCol: String,
      tier: String,
      sizeCol: Column,
      valueSums: Map[String, Column] = Map.empty,
      langCol: Option[String] = None,
      sketches: Map[String, Column] = Map.empty,
      topk: Map[String, Column] = Map.empty,
      topkCapacity: Int = 128,
      quantiles: Map[String, Column] = Map.empty,
      quantileCapacity: Int = 4096
  ): DataFrame = {
    val keys = series.map(col) :+ Tiers.bucket(col(tsCol), tier).as("bucket_ts")
    val base: Seq[Column] =
      count(lit(1)).as("point_count") +:
        sum(sizeCol).as("byte_size") +:
        valueSums.toSeq.sortBy(_._1).map { case (n, c) => sum(c).as(n) } ++:
        // HLL++ (datasketches) distinct sketches: mergeable across
        // tiers via hll_union_agg, so coarser tiers re-aggregate
        // sketches exactly like counts — union of sub-sketches is
        // bit-identical to sketching the union directly
        sketches.toSeq.sortBy(_._1).map { case (n, c) => hll_sketch_agg(c).as(n) } ++:
        // SpaceSaving heavy-hitter sketches (TopK): mergeable the same
        // way; exact below `topkCapacity` distinct items per state
        topk.toSeq.sortBy(_._1).map { case (n, c) => TopK.sketch(c, topkCapacity).as(n) } ++:
        // quantile sketches: exact weighted value histogram below
        // `quantileCapacity` distinct values, equi-weight t-digest above
        quantiles.toSeq.sortBy(_._1).map { case (n, c) =>
          QuantileSketch.sketch(c, quantileCapacity).as(n)
        }
    langCol match {
      case None =>
        df.groupBy(keys: _*).agg(base.head, base.tail: _*)
      case Some(lc) =>
        // two-level: (keys, lang) counts, then fold the histogram into a
        // map with built-ins only (map_from_entries over sorted entries,
        // so map key order is deterministic for struct equality)
        val perLang = df
          .groupBy(keys :+ col(lc).as("__lang"): _*)
          .agg(base.head, base.tail: _*)
        val gk = series.map(col) :+ col("bucket_ts")
        // sketches re-merge through hll_union_agg (union of per-lang
        // sub-sketches == sketching the whole bucket directly), so
        // requesting sketches together with a lang histogram loses
        // nothing
        val aggs: Seq[Column] =
          sum("point_count").as("point_count") +:
            sum("byte_size").as("byte_size") +:
            valueSums.keys.toSeq.sorted.map(n => sum(col(n)).as(n)) ++:
            sketches.keys.toSeq.sorted.map(n => hll_union_agg(col(n)).as(n)) ++:
            topk.keys.toSeq.sorted.map(n => TopK.mergeSketch(col(n), topkCapacity).as(n)) ++:
            quantiles.keys.toSeq.sorted.map(n =>
              QuantileSketch.mergeSketch(col(n), quantileCapacity).as(n)
            ) :+
            map_from_entries(
              array_sort(collect_list(struct(col("__lang"), col("point_count"))))
            ).as("lang_hist")
        perLang.groupBy(gk: _*).agg(aggs.head, aggs.tail: _*)
    }
  }

  /** Finer tier -> coarser tier: counts and sums re-sum; the lang_hist
    * map (if present) merges by exploding entries and re-folding.
    */
  def reRollup(
      tierDf: DataFrame,
      series: Seq[String],
      fromTo: (String, String),
      sketchCols: Seq[String] = Seq.empty,
      topkCols: Seq[String] = Seq.empty,
      topkCapacity: Int = 128,
      quantileCols: Seq[String] = Seq.empty,
      quantileCapacity: Int = 4096
  ): DataFrame = {
    val (_, to) = fromTo
    val hasHist = tierDf.columns.contains("lang_hist")
    val measureCols = tierDf.columns.toIndexedSeq
      .filterNot(series.contains)
      .filterNot(Seq("bucket_ts", "lang_hist").contains)
      .filterNot(sketchCols.contains)
      .filterNot(topkCols.contains)
      .filterNot(quantileCols.contains)
    val keys = series.map(col) :+ Tiers.bucket(col("bucket_ts"), to).as("bucket_ts")
    if (!hasHist) {
      val aggs = measureCols.map(c => sum(col(c)).as(c)) ++
        sketchCols.map(c => hll_union_agg(col(c)).as(c)) ++
        topkCols.map(c => TopK.mergeSketch(col(c), topkCapacity).as(c)) ++
        quantileCols.map(c => QuantileSketch.mergeSketch(col(c), quantileCapacity).as(c))
      tierDf.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
    } else {
      val exploded = tierDf.select(
        (series.map(col) :+ Tiers.bucket(col("bucket_ts"), to).as("bucket_ts")) ++
          measureCols.map(col) :+ explode(col("lang_hist")).as(Seq("__lang", "__lang_cnt")): _*
      )
      // per-lang partial: measures must not double-count, so measures
      // aggregate over distinct source rows — instead aggregate measures
      // and histogram in two branches and join on the keys
      val measureAggs = measureCols.map(c => sum(col(c)).as(c)) ++
        sketchCols.map(c => hll_union_agg(col(c)).as(c)) ++
        topkCols.map(c => TopK.mergeSketch(col(c), topkCapacity).as(c)) ++
        quantileCols.map(c => QuantileSketch.mergeSketch(col(c), quantileCapacity).as(c))
      val measures = tierDf
        .groupBy(keys: _*)
        .agg(measureAggs.head, measureAggs.tail: _*)
      val hist = exploded
        .groupBy(series.map(col) :+ col("bucket_ts") :+ col("__lang"): _*)
        .agg(sum("__lang_cnt").as("__cnt"))
        .groupBy(series.map(col) :+ col("bucket_ts"): _*)
        .agg(
          map_from_entries(array_sort(collect_list(struct(col("__lang"), col("__cnt")))))
            .as("lang_hist")
        )
      measures.join(hist, series :+ "bucket_ts")
    }
  }

  /** Convenience: build every tier from raw in one pass per tier edge
    * (raw is scanned once; each next tier reads the previous). Returns
    * tier name -> DataFrame.
    */
  def allTiers(
      df: DataFrame,
      series: Seq[String],
      tsCol: String,
      sizeCol: Column,
      valueSums: Map[String, Column] = Map.empty,
      langCol: Option[String] = None
  ): Map[String, DataFrame] = {
    val t1m = fromRaw(df, series, tsCol, "1m", sizeCol, valueSums, langCol)
    val t1h = reRollup(t1m, series, "1m" -> "1h")
    val t1d = reRollup(t1h, series, "1h" -> "1d")
    val t30 = reRollup(t1d, series, "1d" -> "30d")
    Map("1m" -> t1m, "1h" -> t1h, "1d" -> t1d, "30d" -> t30)
  }
}
