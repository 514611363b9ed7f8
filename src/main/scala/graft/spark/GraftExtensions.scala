package graft.spark

import graft.functions.DotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions: exposes the engine's native expressions to SQL
  * (`spark.sql.extensions=graft.spark.GraftExtensions` on
  * spark-submit; `Sessions.build` wires it for local runs).
  *
  *   SELECT graft_dot(a, b) ...   -- codegen'd array<double> dot product
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        new FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          require(children.length == 2, "graft_dot(a, b) takes exactly two array arguments")
          DotProduct(children.head, children(1))
        }
      )
    )
  }
}
