package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two `array<double>` columns.
  *
  * The built-in higher-order-function formulation
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) allocates an
  * intermediate array and interprets the lambdas per element; this
  * expression compiles to a tight primitive loop inside whole-stage
  * codegen — the O(n²·dim) pair loops of the similarity operators are
  * exactly the "custom Expression beats UDF beats HOF" case of
  * SURVEY.md §2.9. Interpreted `nullSafeEval` kept for completeness.
  *
  * Semantics match the HOF formulation bit-for-bit: sequential
  * left-to-right sum of element products in double precision (same
  * fp rounding order); mismatched lengths and null elements yield
  * NULL, exactly as `zip_with` null-padding + null-propagating `+`
  * do. `ImplicitCastInputTypes` coerces SQL-path children
  * (array<float>/array<int>) to array<double> so `graft_dot` never
  * misreads narrower element storage.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression
    with ImplicitCastInputTypes {

  // AbstractDataType is private[sql]; the inferred Seq[ArrayType]
  // conforms covariantly
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => s"""
        |int ${ev.value}_n = $a.numElements();
        |if (${ev.value}_n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double ${ev.value}_s = 0.0;
        |  for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
        |    if ($a.isNullAt(${ev.value}_i) || $b.isNullAt(${ev.value}_i)) {
        |      ${ev.isNull} = true;
        |      break;
        |    }
        |    ${ev.value}_s += $a.getDouble(${ev.value}_i) * $b.getDouble(${ev.value}_i);
        |  }
        |  if (!${ev.isNull}) ${ev.value} = ${ev.value}_s;
        |}
      """.stripMargin
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-level entry point: `dot(a, b)` over array<double> (cast
    * float arrays first — the cast is free at the scan).
    */
  def apply(a: Column, b: Column): Column = {
    val cast = (c: Column) => c.cast("array<double>")
    Bridge.column(DotProduct(Bridge.expression(cast(a)), Bridge.expression(cast(b))))
  }
}
