package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Product-quantization encoder: one embedding -> `m` sub-codes in a
  * single fused primitive loop (the 100-TB ANN memory path — an
  * `m`-byte code replaces a `dim * 4`-byte vector on every corpus row).
  *
  * The codebook (flattened `[(s * k + c) * dsub + j]`) rides the
  * expression as a codegen REFERENCE object, not a literal expression
  * tree — the same reasoning as LshProjections: a 1024-element literal
  * array expression would dominate analysis/codegen time and the task
  * binary. Sub-code `s` is the first index minimizing the sequential
  * L2 distance `sum_j (v[s*dsub+j] - cb[(s*k+c)*dsub+j])^2` — strict
  * `<` comparison, so ties break on the LOWEST codeword index, and the
  * summation order is fixed left-to-right: any SQL engine replays the
  * exact doubles (the q66 oracle does).
  *
  * Width contract: every row must carry exactly `m * dsub` non-null
  * elements; anything else raises (a silently nulled code would rank
  * garbage neighbors instead of failing).
  */
case class PqEncode(child: Expression, codebook: Array[Double], m: Int, k: Int, dsub: Int)
    extends UnaryExpression
    with ImplicitCastInputTypes {

  require(codebook.length == m * k * dsub, s"codebook length ${codebook.length} != m*k*dsub ${m * k * dsub}")

  override def inputTypes = Seq(ArrayType(org.apache.spark.sql.types.DoubleType))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_pq_encode"

  private def dim: Int = m * dsub

  private def fail(n: Int): Nothing =
    throw new IllegalArgumentException(
      s"PQ codebook is sized for uniform dim $dim without null elements, got $n elements"
    )

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
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestDist = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        var dist = 0.0
        var j = 0
        while (j < dsub) {
          val diff = v(s * dsub + j) - codebook((s * k + c) * dsub + j)
          dist += diff * diff
          j += 1
        }
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"""
        |int ${ev.value}_n = $a.numElements();
        |if (${ev.value}_n != $dim) {
        |  throw new IllegalArgumentException(
        |    "PQ codebook is sized for uniform dim $dim without null elements, got " + ${ev.value}_n + " elements");
        |}
        |double[] ${ev.value}_v = new double[$dim];
        |for (int ${ev.value}_d = 0; ${ev.value}_d < $dim; ${ev.value}_d++) {
        |  if ($a.isNullAt(${ev.value}_d)) {
        |    throw new IllegalArgumentException(
        |      "PQ codebook is sized for uniform dim $dim without null elements, got a null element");
        |  }
        |  ${ev.value}_v[${ev.value}_d] = $a.getDouble(${ev.value}_d);
        |}
        |int[] ${ev.value}_codes = new int[$m];
        |for (int ${ev.value}_s = 0; ${ev.value}_s < $m; ${ev.value}_s++) {
        |  int ${ev.value}_best = 0;
        |  double ${ev.value}_bd = Double.POSITIVE_INFINITY;
        |  for (int ${ev.value}_c = 0; ${ev.value}_c < $k; ${ev.value}_c++) {
        |    double ${ev.value}_dist = 0.0;
        |    for (int ${ev.value}_j = 0; ${ev.value}_j < $dsub; ${ev.value}_j++) {
        |      double ${ev.value}_diff = ${ev.value}_v[${ev.value}_s * $dsub + ${ev.value}_j]
        |        - $cb[(${ev.value}_s * $k + ${ev.value}_c) * $dsub + ${ev.value}_j];
        |      ${ev.value}_dist += ${ev.value}_diff * ${ev.value}_diff;
        |    }
        |    if (${ev.value}_dist < ${ev.value}_bd) { ${ev.value}_bd = ${ev.value}_dist; ${ev.value}_best = ${ev.value}_c; }
        |  }
        |  ${ev.value}_codes[${ev.value}_s] = ${ev.value}_best;
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(${ev.value}_codes);
      """.stripMargin
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  def apply(emb: Column, codebook: Array[Double], m: Int, k: Int, dsub: Int): Column =
    Bridge.column(PqEncode(Bridge.expression(emb.cast("array<double>")), codebook, m, k, dsub))
}
