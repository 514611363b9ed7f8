package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("matches the HOF formulation bit-for-bit, including nulls") {
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0, 6.0))),
      (Some(Seq(0.1, 0.2)), Some(Seq(0.3, 0.7))),
      (None, Some(Seq(1.0))),
      (Some(Seq(1.0)), None)
    ).toDF("a", "b")
    val out = df
      .select(
        DotProduct(col("a"), col("b")).as("fast"),
        hofDot(col("a"), col("b")).as("hof")
      )
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1)) // exact bits
    }
  }

  test("mismatched lengths and null elements return NULL like the HOF") {
    val df = Seq(
      (Seq(Some(1.0), Some(2.0), Some(3.0)), Seq(Some(4.0), Some(5.0))), // ragged
      (Seq(Some(1.0), None), Seq(Some(2.0), Some(3.0))), // null element left
      (Seq(Some(1.0), Some(2.0)), Seq(None, Some(3.0))), // null element right
      (Seq(Some(1.0), Some(2.0)), Seq(Some(3.0), Some(4.0))) // clean
    ).toDF("a", "b")
    val out = df
      .select(DotProduct(col("a"), col("b")).as("fast"), hofDot(col("a"), col("b")).as("hof"))
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
    assert(out.count(_.isNullAt(0)) == 3)
  }

  test("SQL path coerces float/int arrays instead of misreading storage") {
    Seq((Array(1.5f, 2.5f), Array(2, 4))).toDF("a", "b").createOrReplaceTempView("dp_coerce")
    val v = spark.sql("SELECT graft_dot(a, b) AS d FROM dp_coerce").head().getDouble(0)
    assert(v == 1.5 * 2.0 + 2.5 * 4.0)
  }

  test("works over many rows through whole-stage codegen") {
    val df = spark
      .range(1000)
      .select(
        transform(sequence(lit(0), lit(63)), i => (col("id") + i).cast("double")).as("a"),
        transform(sequence(lit(0), lit(63)), i => (col("id") * 2 + i).cast("double")).as("b")
      )
    val s = df.select(sum(DotProduct(col("a"), col("b"))).as("s")).head().getDouble(0)
    val h = df.select(sum(hofDot(col("a"), col("b"))).as("s")).head().getDouble(0)
    assert(s == h)
  }

  test("float arrays cast once and match the per-element cast") {
    val df = Seq((Array(1.5f, 2.5f), Array(2.0f, 4.0f))).toDF("a", "b")
    val v = df
      .select(DotProduct(col("a").cast("array<double>"), col("b").cast("array<double>")).as("d"))
      .head()
      .getDouble(0)
    assert(v == 1.5 * 2.0 + 2.5 * 4.0)
  }
}
