package graft

import graft.gql.{Lexer, Parser}
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic fuzz over the GQL front end: whatever the input, parsing
  * either succeeds or throws one of the two declared error types
  * (LexError / IllegalArgumentException) — never a NumberFormatException,
  * MatchError, stack overflow, or hang. The engine builds its per-statement
  * error Results from exactly these two types, so anything else would
  * escape `exec` as a crash.
  */
class ParserFuzzSpec extends AnyFunSuite {

  private def mustNotCrash(input: String): Unit =
    try { Parser.parse(input); () }
    catch {
      case _: Lexer.LexError => ()
      case _: IllegalArgumentException => ()
      case e: StackOverflowError =>
        fail(s"stack overflow on ${input.take(80)}")
      case e: Throwable =>
        fail(s"input '${input.take(80)}' threw ${e.getClass.getName}: ${e.getMessage}")
    }

  test("random character soup never crashes the front end") {
    val rnd = new scala.util.Random(42)
    val alphabet = "{}[]();:,*'$=><-.0123456789 abIJK\n\t自d_"
    for (_ <- 1 to 4000) {
      val len = rnd.nextInt(80)
      mustNotCrash((0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
  }

  test("mutated valid statements never crash the front end") {
    val seeds = Seq(
      "{create: 'ga', group: [{g: ['a'], index: ['a']}, ['g', 'e', 'g']]};",
      "{upset: 'g', vertex: [[1, {x: 1.5, t: 0d1600000000, b: 0b'QUJD'}], [2]]};",
      "{upset: 'e', edge: [[1, ->, 2], [2, <-: {w: 3}, 1]]};",
      "{query: 'g', in: 'ga', where: {$and: [{x: {$gt: (a) => { let m = a * 2; return m }}}, {t: [1, 2]}]}};",
      "{query: 'g', in: 'ga', where: {v: {limit: 3, $near: [0.5, 1.0]}}};",
      "{remove: 'g', vertex: {x: {$lt: 5}}};",
      "ast {query: '*', in: 'ga'};",
      "import '/tmp/x.gql';")
    val rnd = new scala.util.Random(7)
    for (seed <- seeds; _ <- 1 to 300) {
      val chars = seed.toCharArray.toBuffer
      rnd.nextInt(4) match {
        case 0 => chars.remove(rnd.nextInt(chars.length)) // delete
        case 1 => chars.insert(rnd.nextInt(chars.length + 1),
          "{}[]',:*$9".charAt(rnd.nextInt(10)))           // insert
        case 2 =>                                         // swap two positions
          val (a, b) = (rnd.nextInt(chars.length), rnd.nextInt(chars.length))
          val t = chars(a); chars(a) = chars(b); chars(b) = t
        case 3 => chars(rnd.nextInt(chars.length)) = ' '  // blank out
      }
      mustNotCrash(chars.mkString)
    }
  }

  test("overflow digit runs are LexErrors, not NumberFormatExceptions") {
    intercept[Lexer.LexError](Lexer.tokenize("99999999999999999999999999"))
    intercept[Lexer.LexError](Lexer.tokenize("0d99999999999999999999999999"))
  }

  test("bare-datetime overflow and unterminated calls are declared parse errors") {
    intercept[IllegalArgumentException](
      Parser.parse("{upset: 'g', vertex: [[1, {t: d99999999999999999999}]]};"))
    intercept[IllegalArgumentException](
      Parser.parse("{query: 'g', in: 'x', where: {a: min(}};"))
    // a dangling open paren nested in the arguments must also terminate
    intercept[IllegalArgumentException](
      Parser.parse("{query: 'g', in: 'x', where: {a: min(f(}};"))
  }

  test("nested parens inside call arguments do not derail the statement") {
    // the inner f(x)'s ')' must not be taken as min's terminator — both the
    // trailing key after the call and the following statement must survive
    val stmts = Parser.parse(
      "{query: 'g', in: 'x', where: {a: min(f(x), g(h(2))), b: 7}}; " +
        "{query: 'g2', in: 'x'};")
    assert(stmts.length == 2, s"parsed ${stmts.length} statements")
  }
}
