package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.expressions.{DotProductLong, MisraGries}

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions for SQL users. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — the
  * DataFrame API reaches the same expressions directly through
  * `graft.operators.Similarity`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductLong].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          s"graft_dot expects exactly 2 arguments, got ${children.length}")
        DotProductLong(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_mg"),
      new ExpressionInfo(classOf[MisraGries].getName, "graft_mg"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          s"graft_mg expects (item, k), got ${children.length} arguments")
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_mg's k must be an integer literal, got $other")
        }
        MisraGries(children(0), k)
      }))
  }
}
