package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen-capable vector kernels (SURVEY.md §4 custom-Catalyst checklist
  * item 1). The reference hand-vectorizes squared-L2 with AVX/SSE2/NEON
  * (/root/reference/src/base/math/Distance.cpp:7-87,133-157); on Spark the
  * same effect comes from emitting a tight scalar loop into whole-stage
  * codegen — the JIT vectorizes it, and there is no per-element boxing the
  * way a `zip_with`/`aggregate` lambda pipeline has (those are interpreted,
  * ~100x slower on brute-force pair scans).
  *
  * Summation is a strict left-to-right loop in both the interpreted and the
  * generated path, so results are bit-identical to DuckDB's `list_sum` over
  * the same doubles — keeping these expressions oracle-checkable.
  */
abstract class VectorFold extends BinaryExpression {
  // Callers cast inputs to array<double> explicitly (see VectorOps.vecs);
  // no ExpectsInputTypes — AbstractDataType is not public API in Spark 4.
  override def dataType: DataType = DoubleType

  /** Java statement accumulating into `s` given element exprs `xa`, `xb`. */
  protected def foldJava(xa: String, xb: String): String
  protected def foldEval(a: Double, b: Double): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += foldEval(x.getDouble(i), y.getDouble(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${foldJava(s"$a.getDouble($i)", s"$b.getDouble($i)")};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
}

/** Dot product of two array<double> columns. */
case class DotProd(left: Expression, right: Expression) extends VectorFold {
  override protected def foldJava(xa: String, xb: String): String = s"$xa * $xb"
  override protected def foldEval(a: Double, b: Double): Double = a * b
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProd = copy(l, r)
  override def prettyName: String = "graft_dotp"
}

/** Squared L2 distance between two array<double> columns — the `$near`
  * predicate kernel (reference ScanPlan.cpp:685-736). */
case class Dist2(left: Expression, right: Expression) extends VectorFold {
  override protected def foldJava(xa: String, xb: String): String =
    s"($xa - $xb) * ($xa - $xb)"
  override protected def foldEval(a: Double, b: Double): Double = (a - b) * (a - b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Dist2 = copy(l, r)
  override def prettyName: String = "graft_dist2"
}

object VectorExprs {
  private def e(c: Column): Expression = ColumnBridge.expression(c)
  def dotp(a: Column, b: Column): Column = ColumnBridge.column(DotProd(e(a), e(b)))
  def dist2(a: Column, b: Column): Column = ColumnBridge.column(Dist2(e(a), e(b)))
}
