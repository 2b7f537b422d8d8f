package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration of the codegen'd vector kernels (SURVEY §4
  * custom-Catalyst checklist: the `SparkSessionExtensions` tier). With
  * these registered, a pure-SQL user gets the same whole-stage-codegen
  * expressions the DataFrame operators use:
  *
  * {{{
  *   spark.sql("SELECT graft_dist2(a.v, b.v) FROM ...")   // squared L2
  *   spark.sql("SELECT graft_dot(a.v, b.v)   FROM ...")   // dot product
  * }}}
  *
  * Two routes, one function list:
  *  - cluster config: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (or `SparkSession.builder().withExtensions(new GraftExtensions)`);
  *  - live session: `GraftExtensions.register(spark)` — same builders into
  *    the session's FunctionRegistry, no session rebuild needed.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(e.injectFunction)
}

object GraftExtensions {
  private def fn(name: String, build: Seq[Expression] => Expression, usage: String) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[VectorFold].getName, null, name, usage, ""),
      build)

  /** The injected function list — shared by both registration routes. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("graft_dist2", args => Dist2(args(0), args(1)),
      "graft_dist2(a, b) - squared L2 distance between two array<double>"),
    fn("graft_dot", args => DotProd(args(0), args(1)),
      "graft_dot(a, b) - dot product of two array<double>"))

  /** Register into an already-running session's FunctionRegistry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, build) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, build)
    }
}
