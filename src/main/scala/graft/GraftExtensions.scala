package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.DotProduct

/** SparkSessionExtensions entry point: registers graft's custom expressions
  * under SQL names. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` at session
  * build (Verify/Bench/tests do) — after which
  * `SELECT graft_dot(a, b)` works from SQL as well as the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, s"graft_dot expects 2 arguments, got ${children.size}")
        DotProduct(children.head, children(1))
      }))
  }
}
