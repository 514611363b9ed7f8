package graft.correct

import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.feature.{StringIndexer, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M1 in its TRAINED form — the reference's auto_instance /
  * AutoGluon-style imputer (`src/auto_instance.py:6-78`,
  * `src/autogluon_imputer.py:76-121`): per error column, fit a
  * multiclass classifier on the error-free rows (P2 subset) with the
  * OTHER columns as features, and emit `predict_proba` class
  * probabilities for the column's error cells as suggestions
  * `(row_id, col, corrector=auto_instance, candidate, score)`,
  * with the reference's P5 threshold (p >= 0.001, candidate != error
  * value) and A14 class-count guard (target classes under
  * `minClassCount` occurrences are dropped from training,
  * `src/auto_instance.py:35-41`).
  *
  * Deterministic replacement for AutoGluon: a seeded
  * RandomForestClassifier over [numeric-parsed columns + per-column
  * indexed categoricals]. A column counts as numeric when every
  * non-empty error-free value parses as a double (the all-string
  * table is the reference's contract; numeric semantics are recovered
  * per column, not assumed). `StringIndexer(alphabetAsc)` keeps the
  * label and feature index spaces deterministic.
  *
  * Scale shape: training runs on the distributed error-free subset
  * (spark.ml), one model per ERROR column (bounded by table width,
  * like the reference's `columns_with_errors` loop); scoring joins
  * only the error cells. Nothing driver-side scales with row count.
  */
object MlImputer {

  def suggest(
      df: DataFrame,
      rowId: String,
      cols: Seq[String],
      detected: DataFrame,
      seed: Long = 42L,
      minClassCount: Int = 10,
      numTrees: Int = 50,
      maxDepth: Int = 14,
      featureSubsetStrategy: String = "auto"
  ): DataFrame = {
    val spark = df.sparkSession
    val errorRows = detected.select("row_id").distinct()
    val base = df.select(col(rowId).as("row_id") +: cols.map(col): _*)
    val clean = base.join(errorRows, Seq("row_id"), "left_anti").cache()

    val errCols =
      detected.select("col").distinct().collect().map(_.getString(0)).sorted.toSeq.filter(cols.contains)
    if (errCols.isEmpty) { clean.unpersist(); return Correctors.emptySuggestions(spark) }

    // numeric-vs-categorical per column, decided once on the clean rows;
    // integer-valued numeric columns additionally get parity-bearing
    // interaction features (flags packed into one scan: bit0 = some
    // value fails double parse, bit1 = some parsed value is fractional)
    val colFlags = clean
      .select(cols.map { c =>
        val d = col(c).try_cast("double")
        max(
          when(col(c) =!= "" && d.isNull, 3)
            .when(col(c) =!= "" && d =!= floor(d), 2)
            .otherwise(0)
        ).as(c)
      }: _*)
      .head()
    // every row has an error cell -> no training data at all: the
    // max() row above is all-null and every per-column keep-guard
    // would fail anyway, so return empty instead of NPE-ing on unbox
    if (colFlags.isNullAt(0)) { clean.unpersist(); return Correctors.emptySuggestions(spark) }
    val numericCols = cols.zipWithIndex.collect { case (c, i) if (colFlags.getInt(i) & 1) == 0 => c }.toSet
    val integerCols = cols.zipWithIndex.collect { case (c, i) if colFlags.getInt(i) == 0     => c }.toSet

    // independent per-target fits, overlapped on a bounded driver pool
    // (graft.core.Par; tree fits here are bigger than the
    // pair-classifier's but still per-column independent and seeded)
    val perCol = graft.core.Par.mapOrdered(errCols.toArray) { target =>
      val features = cols.filterNot(_ == target)
      val (numF, catF) = features.partition(numericCols.contains)
      // A14, reference semantics (`autogluon_imputer.py:90-92`): train
      // only when the MAJORITY class has >= minClassCount support, but
      // keep ALL classes — rare labels (a city seen 4 times) must stay
      // predictable. (The reference drops sub-10 classes only in its
      // food/address special case, `auto_instance.py:35-41`.)
      val classCounts = clean
        .filter(col(target) =!= "")
        .groupBy(target)
        .count()
        .collect()
      val keep = classCounts.map(_.getString(0)).sorted
      if (keep.length < 2 || classCounts.map(_.getLong(1)).max < minClassCount) None
      else {
        // categorical features: one deterministic index per column
        // (alphabetAsc; unseen values get the trailing "keep" index) —
        // compact tree features, unlike hashing into a sparse space
        // where per-split feature sampling mostly draws empty slots.
        // The indexers are fitted OUTSIDE the model pipeline so
        // high-cardinality columns (an id-like Title with hundreds of
        // values would blow the tree maxBins requirement) can have
        // their nominal metadata stripped and split as plain ordinals;
        // low-cardinality columns keep it and get true subset splits.
        // Derived text signals per categorical feature column — both
        // dense, tree-friendly categoricals (NOT a sparse hashed bag):
        //   first alphanumeric token  (a phone's area code, an address's
        //                              street number block)
        //   punctuation shape         (digit runs -> 9, letter runs -> a;
        //                              '310/246-1501' -> '9/9-9' — a
        //                              formatting fingerprint that
        //                              identifies the record's source
        //                              convention)
        // Measured on renuver restaurant (ef=1): city goes 0/10 -> 9/10
        // and type 0/12 -> 5/12 for a full-depth CART once these two
        // exist, because city is determined within-table by area code +
        // source formatting while the raw phone string is an opaque
        // unique-per-row categorical.
        val deriveText = (in: DataFrame) =>
          catF.foldLeft(in) { (d, c) =>
            d.withColumn(s"__ftr_$c", regexp_extract(lower(col(c)), "[a-z0-9]+", 0))
              .withColumn(
                s"__shr_$c",
                regexp_replace(regexp_replace(lower(col(c)), "[0-9]+", "9"), "[a-z]+", "a")
              )
          }
        val cleanDerived = deriveText(clean)
        val catInputs =
          catF.map(c => (c, s"__cat_$c")) ++
            catF.map(c => (s"__ftr_$c", s"__ft_$c")) ++
            catF.map(c => (s"__shr_$c", s"__sh_$c"))
        val catIndexers = catInputs.map { case (inCol, outCol) =>
          outCol -> new StringIndexer()
            .setInputCol(inCol)
            .setOutputCol(outCol)
            .setStringOrderType("alphabetAsc")
            .setHandleInvalid("keep")
            .fit(cleanDerived)
        }
        // pairwise numeric interaction block: difference, absolute
        // difference, and (for integer-valued pairs) difference parity.
        // Axis-aligned tree splits on RAW grid coordinates cannot
        // express relative-position structure (measured on openml
        // 41027, jungle-chess endgames: a full-depth CART scores 0.295
        // on raw file/rank features vs 0.929 with delta + |delta| +
        // delta-parity — the reference's AutoGluon stack reaches 0.80
        // there). Width-gated: on wide numeric tables the O(numF^2)
        // fan-out dilutes the RF's per-split feature sampling below the
        // raw signal (measured: openml 6 [letter, 16 numeric cols]
        // drops 0.86 -> 0.80 with the block on), while the discrete
        // grid tables the block targets stay far under the gate.
        val maxInteractionWidth = 8
        val numPairs =
          if (numF.length > maxInteractionWidth) Seq.empty[(String, String)]
          else numF.combinations(2).map { case Seq(a, b) => (a, b) }.toSeq
        val pairCols = numPairs.flatMap { case (a, b) =>
          val base = Seq(s"__d_${a}_$b", s"__ad_${a}_$b")
          if (integerCols.contains(a) && integerCols.contains(b)) base :+ s"__pd_${a}_$b" else base
        }
        val featurize = (in: DataFrame) => {
          val withNum =
            numF.foldLeft(in)((d, c) => d.withColumn(s"__num_$c", coalesce(col(c).try_cast("double"), lit(0.0))))
          val withPairs = numPairs.foldLeft(withNum) { case (d, (a, b)) =>
            val delta = col(s"__num_$a") - col(s"__num_$b")
            val d2 = d
              .withColumn(s"__d_${a}_$b", delta)
              .withColumn(s"__ad_${a}_$b", abs(delta))
            if (integerCols.contains(a) && integerCols.contains(b))
              d2.withColumn(s"__pd_${a}_$b", pmod(delta.cast("bigint"), lit(2L)).cast("double"))
            else d2
          }
          catIndexers.foldLeft(deriveText(withPairs)) { case (d, (outCol, ix)) =>
            val indexed = ix.transform(d)
            if (ix.labelsArray.head.length <= 30) indexed
            else indexed.withMetadata(outCol, org.apache.spark.sql.types.Metadata.empty)
          }
        }
        val labelIndexer = new StringIndexer()
          .setInputCol(target)
          .setOutputCol("__label")
          .setStringOrderType("alphabetAsc")
          .setHandleInvalid("skip")
        val assembler = new VectorAssembler()
          .setInputCols((numF.map(c => s"__num_$c") ++ pairCols ++ catIndexers.map(_._1)).toArray)
          .setOutputCol("__fvec")
        val rf = new RandomForestClassifier()
          .setLabelCol("__label")
          .setFeaturesCol("__fvec")
          .setProbabilityCol("__proba")
          .setPredictionCol("__pred")
          .setRawPredictionCol("__raw")
          .setNumTrees(numTrees)
          // the default depth 5 underfits many-class targets (the
          // letter table's 26 classes); depth 14 matches the
          // reference imputer's effectively-unbounded trees
          .setMaxDepth(maxDepth)
          .setFeatureSubsetStrategy(featureSubsetStrategy)
          .setSeed(seed)
        val train = featurize(clean.filter(col(target).isin(keep.toIndexedSeq: _*)))
          .localCheckpoint(true) // tree training iterates the featurized plan many times
        val labelIx = labelIndexer.fit(train)
        // score with a summary-free copy: a binary fit attaches a
        // training summary that pins the SparkSession (non-serializable
        // ObservationManager in Spark 4), and transform's scoring UDF
        // captures the whole model — copy(ParamMap.empty) rebuilds the
        // trees without the summary
        val model = rf
          .fit(assembler.transform(labelIx.transform(train)))
          .copy(org.apache.spark.ml.param.ParamMap.empty)
        // labels in indexer order (alphabetAsc over the TRAINING data)
        val labels = labelIx.labelsArray.head

        // the indexer stage still runs at scoring time and would SKIP
        // rows whose (dirty) target value is outside the label space —
        // mask it with a known label; the label column is unused when
        // predicting
        val errCells = detected
          .filter(col("col") === target)
          .select(col("row_id"), col("error_value"))
          .join(base, "row_id")
          .withColumn(target, lit(keep.head))
        val scored = model
          .transform(assembler.transform(labelIx.transform(featurize(errCells))))
          .select(
            col("row_id"),
            col("error_value"),
            posexplode(vector_to_array(col("__proba"))).as(Seq("pos", "score"))
          )
          .withColumn("candidate", element_at(lit(labels), col("pos") + 1))
        Some(
          scored
            .filter(col("score") >= 0.001 && col("candidate") =!= coalesce(col("error_value"), lit("")))
            .select(
              col("row_id"),
              lit(target).as("col"),
              lit("auto_instance").as("corrector"),
              col("candidate"),
              col("score")
            )
        )
      }
    }
    val decided = perCol.toSeq.flatten
    val out = decided match {
      case Nil => Correctors.emptySuggestions(spark)
      case xs  => xs.reduce(_ unionByName _).cache()
    }
    if (decided.nonEmpty) out.count() // materialize before releasing the training cache
    clean.unpersist()
    out
  }
}
