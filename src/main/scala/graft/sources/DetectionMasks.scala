package graft.sources

import graft.correct.Cells
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Imperfect-detection source (reference `src/dataset.py:205-235`,
  * `raha` mode — completes S7): externally produced error masks as
  * JSON documents `{dataset_name, version, detected_cells_index:
  * [[row, col], ...]}`, one per detector run. The loader selects the
  * single matching run and joins the positions against the dirty
  * table to produce the standard error-cell relation
  * `(row_id, col, error_value)` — the error value is the DIRTY cell
  * at detection time, exactly like the reference's
  * `detected_cells[pos] = dataframe.iloc[pos]`.
  *
  * Recast note: the reference addresses cells positionally
  * (`iloc[row, col]`); here the first index is the stable `row_id`
  * key and the second the position of the column in `cols` — row
  * identity by key, never by physical order (SURVEY.md §7).
  *
  * Scale shape: the mask is detector output (error-fraction-sized);
  * the one join against the melted dirty table is the only scan.
  */
object DetectionMasks {

  def read(
      spark: SparkSession,
      path: String,
      datasetName: String,
      version: Long,
      df: DataFrame,
      rowId: String,
      cols: Seq[String]
  ): DataFrame = {
    val masks = spark.read
      .option("multiLine", "true")
      .json(path)
      .filter(col("dataset_name") === datasetName && col("version") === version)
    require(masks.count() == 1, s"ambiguous or missing detection mask for ($datasetName, v$version) at $path")

    joinPositions(masks, df, rowId, cols)
  }

  /** Load one of the reference's ACTUAL Raha detector runs
    * (JSON files under `/root/reference/datasets/raha-detection-results`,
    * loader semantics per reference `src/dataset.py:213-234`): each
    * file is one JSON document with `dataset_name`, `version`,
    * optionally discriminating `error_fraction` / `error_class`, and
    * `detected_cells_index: [[row, col], ...]` positional into the
    * dirty dataframe — exactly one document may match the requested
    * combination. `dirty` must carry positional row ids
    * (`StringCsv.readIndexed`) and `cols` the FULL CSV column list in
    * file order, because the mask's column index counts every column.
    */
  def readRaha(
      spark: SparkSession,
      dir: String,
      datasetName: String,
      version: Long,
      dirty: DataFrame,
      rowId: String,
      cols: Seq[String],
      errorFraction: Option[Int] = None,
      errorClass: Option[String] = None
  ): DataFrame = {
    val all = spark.read.option("multiLine", "true").json(dir)
    val matched = Seq(
      Some(col("dataset_name") === datasetName),
      Some(col("version") === version),
      errorFraction.map(f => col("error_fraction") === f),
      errorClass.map(c => col("error_class") === c)
    ).flatten.reduce(_ && _)
    val masks = all.filter(matched)
    require(
      masks.count() == 1,
      s"ambiguous or missing raha result for ($datasetName, v$version, ef=$errorFraction, class=$errorClass) at $dir"
    )
    joinPositions(masks, dirty, rowId, cols)
  }

  /** Explode a mask's positions and resolve them to
    * `(row_id, col, error_value)` against the dirty table — the error
    * value is the dirty cell at detection time
    * (`detected_cells[pos] = dataframe.iloc[pos]`).
    */
  private def joinPositions(masks: DataFrame, df: DataFrame, rowId: String, cols: Seq[String]): DataFrame = {
    val pos = masks
      .select(explode(col("detected_cells_index")).as("p"))
      .select(
        col("p").getItem(0).cast("long").as("row_id"),
        element_at(array(cols.map(lit): _*), col("p").getItem(1).cast("int") + 1).as("col")
      )
    pos
      .join(Cells.melt(df, rowId, cols), Seq("row_id", "col"))
      .select(col("row_id"), col("col"), col("value").as("error_value"))
  }

  /** Write one mask document (test/fixture helper; real masks come
    * from an external detector).
    */
  def write(path: String, datasetName: String, version: Long, positions: Seq[(Long, Int)]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("dataset_name", datasetName)
    root.put("version", version)
    val arr = root.putArray("detected_cells_index")
    positions.foreach { case (r, c) =>
      val p = arr.addArray()
      p.add(r)
      p.add(c)
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, s"${datasetName}_v$version.json"),
      mapper.writeValueAsString(root).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    )
  }
}
