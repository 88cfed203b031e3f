package graft

import graft.functions.{BloomMightContain, CosineSimilarity, DotProduct, L2SquaredDistance}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extension installing graft's native functions; activate with
  * `spark.sql.extensions=graft.GraftExtensions`. Operators fall back to
  * equivalent HOF formulations when the extension is absent, so the
  * library works either way — the extension is the fast path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_l2sq"),
      new ExpressionInfo(classOf[L2SquaredDistance].getName, "graft_l2sq"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        L2SquaredDistance(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName,
        "graft_might_contain"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BloomMightContain(children(0), children(1))))
  }
}
