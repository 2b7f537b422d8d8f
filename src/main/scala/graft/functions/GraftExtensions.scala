package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

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
  *
  * The builders enforce arity and insert a Cast to array&lt;double&gt; around
  * each argument: VectorFold deliberately trusts its input type (the
  * DataFrame route casts in VectorOps.vecs), so WITHOUT the cast a SQL call
  * on a raw array&lt;float&gt; column would read float-packed ArrayData as
  * doubles — garbage values, no error. The cast makes the SQL route as
  * safe as the DataFrame route.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(e.injectFunction)
}

object GraftExtensions {
  private def fn(name: String, className: String,
                 build: (Expression, Expression) => Expression, usage: String) =
    (FunctionIdentifier(name),
      new ExpressionInfo(className, null, name, usage, ""),
      (args: Seq[Expression]) => {
        if (args.length != 2)
          throw new IllegalArgumentException(
            s"$name expects exactly 2 arguments, got ${args.length}")
        def asDoubles(e: Expression) = Cast(e, ArrayType(DoubleType))
        build(asDoubles(args(0)), asDoubles(args(1)))
      })

  /** The injected function list — shared by both registration routes. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("graft_dist2", classOf[Dist2].getName, Dist2(_, _),
      "graft_dist2(a, b) - squared L2 distance between two array<double>"),
    fn("graft_dot", classOf[DotProd].getName, DotProd(_, _),
      "graft_dot(a, b) - dot product of two array<double>"))

  /** Register into an already-running session's FunctionRegistry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, build) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, build)
    }
}
