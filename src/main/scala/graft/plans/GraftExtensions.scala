package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions wiring: makes the engine's native functions
  * available in plain SQL on any session built with
  * `spark.sql.extensions=graft.plans.GraftExtensions` — the deployment
  * path for clusters where the session is constructed by infrastructure,
  * not by library code (the runtime alternative is
  * [[CosineSimilarity.register]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs.head, exprs(1))))
    // whole-operator tier: the native as-of join's physical strategy
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
