package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for SQL use (`SELECT cosine_sim(a, b)`).
  *
  * Wire up with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSimilarityExpr(args(0), args(1))))
    e.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHashExpr].getName, "rolling_hash"),
      (args: Seq[Expression]) => RollingHashExpr(args(0))))
    e.injectPlannerStrategy(_ => TopKStrategy)
    e.injectOptimizerRule(_ => RewriteWindowTopK)
    e.injectOptimizerRule(_ => PartitionDatePruning)
  }
}
