package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** All-string CSV source/sink (reference S1/S3: `src/dataset.py:147-160`
  * reads every cell as `str` with `keep_default_na=False`, so the empty
  * string survives as `""`, never NaN/null — the `<MV>` missing-value
  * token codec depends on that).
  *
  * Spark's CSV reader maps empty fields to null by default; here both
  * directions pin `emptyValue` and disable null coercion so `""`
  * round-trips byte-identically, and the schema is forced to
  * StringType for every column (no inference — type erasure is the
  * reference's correction-layer contract, SURVEY.md §1.2).
  */
object StringCsv {

  /** Read with every column as non-inferred StringType; `""` preserved. */
  def read(spark: SparkSession, path: String, columns: Seq[String] = Seq.empty): DataFrame = {
    val reader = spark.read
      .option("header", "true")
      .option("nullValue", "\u0000") // never matches -> nothing becomes null
      .option("emptyValue", "")
    if (columns.nonEmpty)
      reader.schema(StructType(columns.map(c => StructField(c, StringType)))).csv(path)
    else
      reader.csv(path) // header-only inference: all columns default to string
  }

  /** Read with a POSITIONAL `row_id` column (0-based file line order) —
    * the cell-addressing contract of the reference's pandas index
    * (`src/dataset.py:147-153`) and of the raha detection masks, which
    * index rows by position. Only valid for a single file small enough
    * to be one scan partition (fixture-sized tables); keyed tables at
    * scale derive row identity from input keys instead (SURVEY.md §7).
    */
  def readIndexed(spark: SparkSession, path: String): DataFrame = {
    // rows with absent trailing fields parse as null despite the
    // nullValue pin — normalize to "" (keep_default_na=False parity)
    val base = read(spark, path).na.fill("")
    val rdd = base.rdd
    require(
      rdd.getNumPartitions == 1,
      s"positional row ids need a single-partition read; $path split into ${rdd.getNumPartitions}"
    )
    val schema = StructType(StructField("row_id", org.apache.spark.sql.types.LongType) +: base.schema.fields)
    spark.createDataFrame(
      rdd.zipWithIndex().map { case (r, i) => org.apache.spark.sql.Row.fromSeq(i +: r.toSeq) },
      schema
    )
  }

  /** Write preserving `""` as a QUOTED empty field — the reader's
    * `emptyValue` then restores `""` while unquoted empties stay the
    * (never-matching) null token's business. Spark's writer quotes the
    * empty string by default; overriding `emptyValue` to an unquoted
    * empty would collapse `""` and null on read-back.
    */
  def write(df: DataFrame, path: String): Unit =
    df.write
      .mode("overwrite")
      .option("header", "true")
      .csv(path)
}
