package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** All `nPlanes` LSH hyperplane projections of one embedding in a
  * single fused primitive loop.
  *
  * Plane component (p, d) is the 31-bit LCG
  * `((131p + d) * 1103515245 + 12345) mod 2^31`, scaled to [-1, 1) —
  * integer arithmetic only, identical to the SQL the DuckDB oracles
  * run, so LSH checks stay algorithm-parity exact. Computing the
  * plane value INLINE beats both prior formulations: the interpreted
  * `transform/zip_with/aggregate` HOF chain (~0.9 ms CPU per row at
  * dim 64 × 128 planes) and a 128-way `array(DotProduct…)` projection
  * (blows the codegen method budget and falls back to interpreted
  * eval, re-evaluating the child per plane). There is no plane
  * literal at all — nothing mega-sized rides the task binary.
  *
  * Width contract: every row must carry exactly `dim` NON-NULL
  * elements, and the embedding itself must be non-null — anything
  * else raises, including a top-level NULL (no null-propagation: a
  * silently nulled projection turns every downstream sign bit into
  * the `otherwise(0)` arm and drops the row into bucket 0 of every
  * table — an O(n²) hot-bucket join hazard on null-heavy corpora).
  * Callers that tolerate null embeddings filter them out first (see
  * `Ann.bucketRelation`: null rows can never be reranked anyway).
  */
case class LshProjections(child: Expression, nPlanes: Int, dim: Int)
    extends UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_lsh_projections"

  override def nullable: Boolean = false

  // never constant-fold: this expression RAISES on null/ragged input,
  // and ConstantFolding would evaluate it at plan time over literal
  // branches (e.g. a union arm carrying lit(null)) whose rows a
  // runtime filter legitimately removes before projection
  override def foldable: Boolean = false

  private def fail(n: Int): Nothing =
    throw new IllegalArgumentException(
      s"LSH planes are sized for uniform dim $dim without null elements, got $n elements"
    )

  private val nullMsg =
    "LSH projection of a NULL embedding: a null-propagated projection would land in bucket 0 of " +
      "every table (silent O(n^2) hot bucket) — filter null embeddings out before bucketing"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) throw new IllegalArgumentException(nullMsg)
    nullSafeEval(v)
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != dim) fail(n)
    val v = new Array[Double](n)
    var d = 0
    while (d < n) {
      if (a.isNullAt(d)) fail(n)
      v(d) = a.getDouble(d)
      d += 1
    }
    val out = new Array[Double](nPlanes)
    var p = 0
    while (p < nPlanes) {
      var s = 0.0
      var i = 0
      while (i < dim) {
        val h = ((131L * p + i) * 1103515245L + 12345L) % 2147483648L
        s += v(i) * (h.toDouble / 1073741824.0 - 1.0)
        i += 1
      }
      out(p) = s
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val a = c.value
    val compute = s"""
        |if (${c.isNull}) {
        |  throw new IllegalArgumentException(
        |    "LSH projection of a NULL embedding: a null-propagated projection would land in bucket 0 of " +
        |    "every table (silent O(n^2) hot bucket) - filter null embeddings out before bucketing");
        |}
        |int ${ev.value}_n = $a.numElements();
        |if (${ev.value}_n != $dim) {
        |  throw new IllegalArgumentException(
        |    "LSH planes are sized for uniform dim $dim without null elements, got " + ${ev.value}_n + " elements");
        |}
        |double[] ${ev.value}_v = new double[$dim];
        |for (int ${ev.value}_d = 0; ${ev.value}_d < $dim; ${ev.value}_d++) {
        |  if ($a.isNullAt(${ev.value}_d)) {
        |    throw new IllegalArgumentException(
        |      "LSH planes are sized for uniform dim $dim without null elements, got a null element");
        |  }
        |  ${ev.value}_v[${ev.value}_d] = $a.getDouble(${ev.value}_d);
        |}
        |double[] ${ev.value}_out = new double[$nPlanes];
        |for (int ${ev.value}_p = 0; ${ev.value}_p < $nPlanes; ${ev.value}_p++) {
        |  double ${ev.value}_s = 0.0;
        |  for (int ${ev.value}_i = 0; ${ev.value}_i < $dim; ${ev.value}_i++) {
        |    long ${ev.value}_h = ((131L * ${ev.value}_p + ${ev.value}_i) * 1103515245L + 12345L) % 2147483648L;
        |    ${ev.value}_s += ${ev.value}_v[${ev.value}_i] * (((double) ${ev.value}_h) / 1073741824.0 - 1.0);
        |  }
        |  ${ev.value}_out[${ev.value}_p] = ${ev.value}_s;
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(${ev.value}_out);
      """.stripMargin
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        $compute
      """,
      isNull = FalseLiteral
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshProjections {
  def apply(emb: Column, nPlanes: Int, dim: Int): Column =
    Bridge.column(LshProjections(Bridge.expression(emb.cast("array<double>")), nPlanes, dim))
}
