package graft.sources

import graft.SparkSpec

/** S1/S3 contract: all columns string, empty string round-trips as ""
  * (never null/NaN) — the reference reads with dtype=str,
  * keep_default_na=False (`src/dataset.py:147-153`).
  */
class StringCsvSpec extends SparkSpec {
  import spark.implicits._

  test("empty string survives a write/read round-trip as \"\", not null") {
    val path = "/tmp/graft_test_stringcsv"
    val df = Seq(("1", "Aragorn", "Gondor"), ("2", "", "Rohan"), ("3", "Saruman", ""))
      .toDF("id", "lord", "kingdom")
    StringCsv.write(df, path)
    val back = StringCsv.read(spark, path, Seq("id", "lord", "kingdom"))
    assert(back.schema.fields.forall(_.dataType.typeName == "string"))
    val rows = back
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(rows.toSeq == Seq(("1", "Aragorn", "Gondor"), ("2", "", "Rohan"), ("3", "Saruman", "")))
  }

  test("header-only read defaults every column to string") {
    val path = "/tmp/graft_test_stringcsv2"
    val df = Seq(("1", "2.5", "2024-01-01")).toDF("a", "b", "c")
    StringCsv.write(df, path)
    val back = StringCsv.read(spark, path)
    assert(back.schema.fields.forall(_.dataType.typeName == "string"))
    assert(back.count() == 1)
  }
}
