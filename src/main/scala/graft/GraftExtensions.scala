package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.DotProduct

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions. Enable with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`), then
  * `SELECT dot_f(a.embedding, b.embedding) ...` works in plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_f"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_f",
        "dot_f(a, b) - dot product of two array<float> columns, " +
          "double accumulation left-to-right"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "dot_f takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
  }
}
