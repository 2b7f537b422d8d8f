package graft

import java.nio.file.{Files, Paths}

import graft.gql.{GqlEngine, Parser}
import org.scalatest.funsuite.AnyFunSuite

/** Golden-file regression against the reference's own suites
  * (/root/reference/test/{query,vertex}/grammar.gql, row counts from
  * query/expect.out) — the SURVEY §5 plan: semantics port, asserting the
  * counts the reference engine produces where our clean semantics agree,
  * and our documented divergence where they don't.
  *
  * Statements are executed one at a time with EAGER row counts — result
  * DataFrames are lazy and a later `drop` statement would otherwise delete
  * the files under them. */
class GoldenSuiteSpec extends AnyFunSuite {
  import SparkTestBase.spark

  private def run(path: String): Seq[(String, Long)] = {
    val script = Files.readString(Paths.get(path))
    val root = Files.createTempDirectory("golden").toString
    val engine = new GqlEngine(spark, root)
    Parser.splitStatements(script).map { stmt =>
      val r = engine.exec(stmt + ";").last
      val n = r.df.map { df =>
        try df.count()
        catch { case _: Exception => -1L }
      }.getOrElse(-1L)
      (r.status, n)
    }
  }

  test("reference query suite replays with golden row counts") {
    assume(Files.exists(Paths.get("/root/reference/test/query/grammar.gql")))
    val res = run("/root/reference/test/query/grammar.gql")
    assert(res.length == 31, s"expected 31 statements, got ${res.length}")
    def status(i: Int) = res(i)._1
    def rows(i: Int) = res(i)._2

    // mutations succeed; the int-key upsert into the string-keyed group
    // fails exactly like the reference ([9] "ERROR: upset fail!")
    Seq(0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 11, 12, 13).foreach(i =>
      assert(status(i).endsWith("SUCCESS"), s"[$i] ${status(i)}"))
    assert(status(9).startsWith("error"), s"[9] ${status(9)}")

    assert(rows(15) == 16) // full scan after merge-on-key re-upserts
    // [16]/[17] target a nonexistent db/group: reference yields 0 rows,
    // we surface an error result — same user-visible "no data" outcome
    assert(status(16).startsWith("error") || rows(16) == 0)
    assert(status(17).startsWith("error") || rows(17) == 0)
    assert(rows(18) == 3)  // category equality
    assert(rows(19) == 3)  // IN-list
    assert(rows(21) == 4)  // datetime $lt
    assert(rows(22) == 3)  // datetime $gt
    assert(rows(23) == 6)  // datetime $gte
    assert(rows(24) == 7)  // datetime $lte
    assert(rows(25) == 10) // existence {datatime: *}
    assert(rows(26) == 3)  // $near on the 2-d feature vectors
    // [27]: lambda bound over an array attribute. The reference DROPS the
    // lambda result (Q11 ◐) and matches all 16 rows; we constant-fold the
    // lambda and reject array<double> <= 0.5 as a type error — documented
    // divergence: implemented-properly beats bug-compatible.
    assert(status(27).startsWith("error") || rows(27) == 0)
    assert(status(28).endsWith("SUCCESS")) // remove {id: '3'}
    assert(status(29).endsWith("SUCCESS")) // dump
    assert(status(30).endsWith("SUCCESS")) // drop
  }

  test("reference edge suite replays with golden row counts incl. cascades") {
    assume(Files.exists(Paths.get("/root/reference/test/edge/grammar.gql")))
    val res = run("/root/reference/test/edge/grammar.gql")
    assert(res.length == 36, s"expected 36 statements, got ${res.length}")
    def status(i: Int) = res(i)._1
    def rows(i: Int) = res(i)._2
    (0 to 35).foreach(i => assert(!status(i).startsWith("error"), s"[$i] ${status(i)}"))
    assert(rows(16) == 0) // missing id
    assert(rows(18) == 1) // id lookup after property update
    assert(rows(19) == 1) // concrete undirected pattern
    assert(rows(20) == 1) // unicode endpoint + wildcard
    assert(rows(22) == 4) // all 'test' tag edges
    // [23] removes vertex 'type1' -> CASCADE kills its relation_dir edge
    assert(rows(24) == 1)
    assert(rows(25) == 1)
    // [27] removes file_meta 2734686464 -> cascade kills test--2734686464
    assert(rows(28) == 4)
    assert(rows(30) == 4) // [29] removes already-cascaded edges: no-op
  }

  test("reference error suite: every malformed statement errors, engine survives (regress_error)") {
    val path = "/root/reference/test/error/errorinfo.gql"
    assume(Files.exists(Paths.get(path)))
    val root = Files.createTempDirectory("golden-err").toString
    val engine = new GqlEngine(spark, root)
    // the suite has no ';' separators — the reference regress harness feeds
    // statements individually; replay line-at-a-time the same way
    val stmts = Files.readString(Paths.get(path)).linesIterator
      .map(_.trim).filter(_.nonEmpty).toSeq
    assert(stmts.nonEmpty)
    stmts.foreach { stmt =>
      val r = engine.exec(stmt + ";").last
      assert(r.status.startsWith("error"), s"'$stmt' must error, got ${r.status}")
    }
    // and nothing leaked into the catalog: every create above failed
    assert(engine.catalog.listGraphs().isEmpty)
  }

  test("reference util suite: show graph / show schema / dump (util/grammar.gql)") {
    val path = "/root/reference/test/util/grammar.gql"
    assume(Files.exists(Paths.get(path)))
    val root = Files.createTempDirectory("golden-util").toString
    val engine = new GqlEngine(spark, root)
    // the util suite runs against an existing vertex_db — create the
    // fixture the reference's vertex suite would have left behind
    engine.exec("{create: 'vertex_db', group: ['v1']};")
    engine.exec("{upset: 'v1', vertex: [['a', {x: 1}], ['b', {x: 2}]]};")
    val res = Parser.splitStatements(Files.readString(Paths.get(path)))
      .map(stmt => engine.exec(stmt + ";").last)
    assert(res.nonEmpty)
    assert(res.forall(!_.status.startsWith("error")),
      s"util suite errored: ${res.map(_.status)}")
    // show graph lists the db; dump emits a replayable script
    assert(res.exists(_.text.exists(_.contains("vertex_db"))))
    assert(res.last.text.exists(_.contains("{upset: 'v1'")))
  }

  test("reference vertex suite replays without unexpected errors") {
    assume(Files.exists(Paths.get("/root/reference/test/vertex/grammar.gql")))
    val res = run("/root/reference/test/vertex/grammar.gql")
    assert(res.nonEmpty)
    val errors = res.zipWithIndex.filter(_._1._1.startsWith("error"))
    // the suite upserts int keys ([1,...], [221,...]) into the group whose
    // key type was fixed as string by the first 'v1' batch — those MUST
    // error (the same enforcement the query suite's golden [9] verifies);
    // nothing else may
    assert(errors.forall(_._1._1.contains("key type mismatch")),
      s"unexpected errors: ${errors.map { case ((s, _), i) => s"[$i] $s" }}")
    assert(errors.length == 2, s"expected exactly the two int-key upsert errors, got $errors")
    // the KNN query ({limit: 3, $near: [vec]}) returns exactly 3 rows
    val knn = res.filter { case (s, n) => s == "QUERY SUCCESS" && n == 3 }
    assert(knn.length == 1, s"expected the limit-3 KNN query, got $res")
  }
}
