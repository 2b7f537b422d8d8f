package graft.gql

/** The GQL embedded mini-language after `=>` (reference lexer mode switch
  * src/gql.l:34-66, grammar src/gql.y:919-1032): `let`, assignment,
  * `return`, arithmetic `+ - * /`, parenthesised exprs, calls.
  *
  * The reference compiles this to stack bytecode run by a VM
  * (src/base/gvm/GVM.cpp:184-293) whose result is then dropped (Q11 ◐).
  * Here the only forms the tests use are argument-free pure arithmetic, so
  * the lambda is CONSTANT-FOLDED at plan time (SURVEY §2.4): evaluate the
  * statements, substitute the returned number as the predicate literal. No
  * bytecode VM, nothing shipped to executors.
  */
object Lambda {
  sealed trait Expr
  case class Num(v: Double) extends Expr
  case class Str(v: String) extends Expr
  case class Ref(name: String) extends Expr
  case class Bin(op: Char, l: Expr, r: Expr) extends Expr
  /** Call like clock() / console.info(x) — native no-ops here. */
  case class Call(target: String, args: Seq[Expr]) extends Expr
  case class Fn(body: Seq[Stmt]) extends Expr

  sealed trait Stmt
  case class Let(name: String, value: Expr) extends Stmt
  case class Assign(name: String, value: Expr) extends Stmt
  case class ExprStmt(e: Expr) extends Stmt
  case class Return(e: Expr) extends Stmt

  /** Evaluate an argument-free lambda body (constant fold). */
  def eval(body: Seq[Stmt]): Option[Double] = evalWith(body, Map.empty)

  /** Evaluate a lambda body with `args` pre-bound (the per-row UDF path:
    * each declared param bound to the row attribute of the same name);
    * returns the `return` value (Double) if one executes, else None.
    * Scoping: one flat mutable frame per invocation — re-`let` shadows,
    * matching GVM global/local slot behavior closely enough for the
    * pure-arithmetic surface. Unbound refs read 0.0, like GVM's
    * zero-initialized slots.
    *
    * DIVERGENCE NOTE: the reference VM compiles and runs lambda predicates
    * but then DROPS the result (/root/reference/src/plan/query/
    * ScanPlan.cpp:424-427), so a lambda bound never filters anything
    * there. Here the returned value is a real comparison operand — the
    * declared semantics, implemented properly (SURVEY §2.4(b)). */
  def evalWith(body: Seq[Stmt], args: Map[String, Double]): Option[Double] = {
    val env = scala.collection.mutable.Map[String, Any](args.toSeq: _*)
    def ev(e: Expr): Any = e match {
      case Num(v) => v
      case Str(v) => v
      case Ref(n) => env.getOrElse(n, 0.0)
      case Fn(b) => Fn(b)
      case Call(_, args) => args.foreach(ev); 0.0 // clock/console.info: no-op
      case Bin(op, l, r) =>
        val (a, b) = (ev(l), ev(r)) match {
          case (x: Double, y: Double) => (x, y)
          case _ => (0.0, 0.0)
        }
        op match {
          case '+' => a + b
          case '-' => a - b
          case '*' => a * b
          case '/' => a / b
        }
    }
    var result: Option[Double] = None
    body.foreach {
      case _ if result.isDefined => ()
      case Let(n, v) => env(n) = ev(v)
      case Assign(n, v) => env(n) = ev(v)
      case ExprStmt(e) => ev(e)
      case Return(e) => ev(e) match {
        case d: Double => result = Some(d)
        case _ => result = Some(0.0)
      }
    }
    result
  }
}
