package graft

import java.io.{PrintWriter, StringWriter}

import graft.gql.{GqlEngine, Parser}
import org.scalatest.funsuite.AnyFunSuite

/** Statement-loop semantics of the interactive shell (reference
  * tool/gqlcmd.cpp parity): multi-line continuation, meta-commands at a
  * fresh prompt only, per-execution COST line, error isolation, dot
  * rendering, EOF termination. The loop is driven with scripted input —
  * the same code path `runMain graft.Shell` uses in pipe mode. */
class ShellSpec extends AnyFunSuite {
  import SparkTestBase.spark

  private def freshEngine(): GqlEngine =
    new GqlEngine(spark, java.nio.file.Files.createTempDirectory("shell").toString)

  /** Run the loop over scripted lines; returns (output, prompts seen). */
  private def drive(engine: GqlEngine, lines: Seq[String]): (String, Seq[String]) = {
    val it = lines.iterator
    val prompts = Seq.newBuilder[String]
    val sw = new StringWriter
    Shell.runLoop(engine, p => { prompts += p; if (it.hasNext) Some(it.next()) else None },
      new PrintWriter(sw))
    (sw.toString, prompts.result())
  }

  test("Parser.incomplete: continuation test agrees with statement splitting") {
    assert(Parser.incomplete("{create: 'g',"))
    assert(Parser.incomplete("{create: 'g', group: ['p']}")) // no ';' yet
    assert(!Parser.incomplete("{create: 'g', group: ['p']};"))
    assert(!Parser.incomplete("{create: 'g', group: ['p']}; // trailing comment"))
    assert(Parser.incomplete("{upset: 'p', vertex: [[1, {t: 'a;b'}]]};{query"))
    assert(!Parser.incomplete("{upset: 'p', vertex: [[1, {t: 'a;b'}]]};"))
    assert(Parser.incomplete("{upset: 'p', vertex: [[1, {t: 'open ")) // open string
    assert(!Parser.incomplete("  \n// just a comment\n"))
  }

  test("multi-line statement executes once closed; prompt switches to continuation") {
    val (out, prompts) = drive(freshEngine(), Seq(
      "{create: 'g',",
      "  group: ['p']};"))
    assert(out.contains("CREATE SUCCESS, COST "))
    assert(prompts.take(2) == Seq(Shell.PROMPT, Shell.CONT))
  }

  test("meta-commands at a fresh prompt; .exit stops before later lines") {
    val e = freshEngine()
    val (out, _) = drive(e, Seq(
      ".help",
      "dot on",
      "dot off",
      ".exit",
      "{create: 'never', group: ['p']};"))
    assert(out.contains(".exit"))         // help text
    assert(out.contains("dot on") && out.contains("dot off"))
    assert(!out.contains("CREATE"), "statement after .exit must not run")
  }

  test("error isolation: a bad statement reports and the loop continues") {
    val (out, _) = drive(freshEngine(), Seq(
      "{query: 'nope', in: 'missing'};",
      "{create: 'g', group: ['p']};"))
    assert(out.contains("error"))
    assert(out.contains("CREATE SUCCESS"))
  }

  test("mid-statement '.exit' is statement text, not a meta-command") {
    val (out, _) = drive(freshEngine(), Seq(
      "{create: 'g',",
      ".exit",          // inside an open statement: must NOT terminate
      "group: ['p']};",
      "{create: 'g2', group: ['p']};"))
    // the .exit line corrupts the statement -> an error result, but the
    // loop keeps going and the next statement still executes
    assert(out.contains("error"))
    assert(out.contains("CREATE SUCCESS"))
  }

  test("ctrl-c sentinel clears a partial statement; blank continuation lines don't") {
    val (out, _) = drive(freshEngine(), Seq(
      "{create: 'garbage',",
      Shell.INTERRUPT,                 // abort mid-statement
      "{create: 'g', group: ['p']};",  // a fresh statement must now work
      "{upset: 'p', vertex: [[1],",
      "",                              // blank line mid-statement: continuation, not a clear
      "  [2]]};"))
    assert(out.contains("^C (input cleared)"))
    assert(out.contains("CREATE SUCCESS"))
    assert(out.contains("UPSET SUCCESS"), s"blank continuation line broke the statement:\n$out")
    assert(!out.contains("garbage"), "aborted fragment must not execute")
  }

  test("dot mode renders edge query results as a DOT digraph") {
    val e = freshEngine()
    val (out, _) = drive(e, Seq(
      "{create: 'mg', group: [{p: []}, ['p', 'knows', 'p']]};",
      "{upset: 'p', vertex: [[1], [2]]};",
      "{upset: 'knows', edge: [[1, ->, 2]]};",
      "dot on",
      "{query: 'knows', in: 'mg'};"))
    assert(out.contains("digraph G {"))
    assert(out.contains("  1 -> 2;"))
    assert(out.contains("}"))
  }

  test("E2E: lifecycle + multi-edge motif through the shell loop (pipe-mode script)") {
    val e = freshEngine()
    val (out, _) = drive(e, Seq(
      "{create: 'bb', group: [{player: ['name']}, ['player', 'follow', 'player']]};",
      "{upset: 'player', vertex: [['p1', {name: 'a'}], ['p2', {name: 'b'}], ['p3', {name: 'c'}]]};",
      "{upset: 'follow', edge: [['p1', ->, 'p2'], ['p2', ->, 'p3']]};",
      "{query: 'follow', in: 'bb',",
      "  where: [a, ->, b, ->, c]};",
      ".exit"))
    assert(out.contains("a|b|c"), s"motif header missing:\n$out")
    assert(out.contains("p1|p2|p3"), s"motif row missing:\n$out")
    assert(out.split("COST").length - 1 == 4, "one COST line per execution")
  }
}
