package graft

import java.nio.file.{Files, Paths}

import graft.gql.{Ast, GqlEngine, Parser}
import graft.walk.AStar
import org.scalatest.funsuite.AnyFunSuite

/** E4 end-to-end on the reference's basketballplayer dataset: rebuild the
  * graph from the statements echoed in its expect.out, then answer the
  * min() walk queries from query.gql — which the reference itself cannot
  * (GPathQuery::execute is a stub, PathPlan.cpp:15-17). The min-cost
  * answer is cross-checked against the independent driver-side A*. */
class BasketballSpec extends AnyFunSuite {
  import SparkTestBase.spark

  private val expectOut = Paths.get("/root/reference/test/basketballplayer-2.X/expect.out")

  test("basketballplayer min() walk answers with A* cross-check") {
    assume(Files.exists(expectOut), "reference fixtures not present")
    val stmts = Files.readAllLines(expectOut).toArray(Array.empty[String])
      .filter(_.matches("""^\[\d+\]:\s.*"""))
      .map(_.replaceFirst("""^\[\d+\]:\s+""", ""))
      .filter(s => s.startsWith("{create") || s.startsWith("{upset"))
    assert(stmts.length > 300)
    val parsed = stmts.flatMap(s => Parser.parse(s))
    // coalesce consecutive same-group upserts (semantically identical,
    // 311 single-row rewrites -> a handful of batch writes)
    val batched = parsed.foldLeft(List.empty[Ast.Stmt]) {
      case (Ast.UpsetVertex(g1, r1) :: rest, Ast.UpsetVertex(g2, r2)) if g1 == g2 =>
        Ast.UpsetVertex(g1, r1 ++ r2) :: rest
      case (Ast.UpsetEdge(g1, e1) :: rest, Ast.UpsetEdge(g2, e2)) if g1 == g2 =>
        Ast.UpsetEdge(g1, e1 ++ e2) :: rest
      case (acc, s) => s :: acc
    }.reverse
    assert(batched.length < 20, s"batching failed: ${batched.length}")

    val root = Files.createTempDirectory("bball").toString
    val engine = new GqlEngine(spark, root)
    batched.foreach { st =>
      val r = engine.execStmt(st)
      assert(!r.status.startsWith("error"), s"$st -> ${r.status}")
    }

    // the reference's own query.gql walk: min() over reversed follow edges
    val q1 = engine.query(
      "{query: 'follow', in: 'basketballplayer', where: ['player102', <-: min(), 'player113']};")
      .collect()(0)
    assert(q1.getAs[String]("from") == "player102")
    assert(q1.getAs[String]("to") == "player113")

    // independent ground truth: A* over the collected follow adjacency,
    // reversed direction, unit costs
    val follow = engine.catalog.read("basketballplayer", "follow")
      .select("src_s", "dst_s").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val ids = follow.flatMap(e => Seq(e._1, e._2)).distinct.zipWithIndex.toMap
    val adj = follow.groupBy(e => ids(e._2).toLong) // reversed: dst -> src
      .map { case (k, es) => k -> es.map(e => (ids(e._1).toLong, 1.0)).toSeq }
    val truth = AStar.search(adj, ids("player102").toLong, ids("player113").toLong)
    if (truth.isEmpty) {
      assert(q1.isNullAt(q1.fieldIndex("cost")), s"engine found a path A* says doesn't exist: $q1")
    } else {
      assert(q1.getAs[Double]("cost") == (truth.length - 1).toDouble,
        s"cost ${q1.getAs[Double]("cost")} != A* ${truth.length - 1}")
    }

    // second query: team201 is not in the follow graph -> unreachable
    val q2 = engine.query(
      "{query: 'follow', in: 'basketballplayer', where: ['player102', ->: min('distance'), 'team201']};")
      .collect()(0)
    assert(q2.isNullAt(q2.fieldIndex("cost")))
  }

  test("nGQL converter: the nebula basketballplayer dialect replays green (l2lite parity)") {
    // the nebula-side statements the reference's converter consumed to
    // produce expect.out's GQL (tool/converter/ngql.cpp regex classes),
    // plus the read-side GO/FETCH/LOOKUP dialect
    val ngql =
      """# nebula basketballplayer subset
        |create space basketballplayer(partition_num=1, replica_factor=1, vid_type=fixed_string(32));
        |:sleep 10;
        |use basketballplayer;
        |create tag player(name string, age int);
        |create tag team(name string);
        |create edge follow(degree int);
        |create edge serve(start_year int, end_year int);
        |create tag index player_index_1 on player(name(20));
        |insert vertex player(name, age) values "player100":("Tim Duncan", 42);
        |insert vertex player(name, age) values "player101":("Tony Parker", 36), "player102":("LaMarcus Aldridge", 33);
        |insert vertex team(name) values "team204":("Spurs");
        |insert edge follow(degree) values "player101"->"player100"@0:(95);
        |insert edge follow(degree) values "player101"->"player102":(90), "player102"->"player100":(75);
        |insert edge serve(start_year, end_year) values "player101"->"team204":(1999, 2018);
        |go from "player101" over follow;
        |go from "player100" over follow reversely;
        |fetch prop on player "player100";
        |lookup on player where player.age > 35;
        |lookup on player where player.name == "Tony Parker";
        |""".stripMargin
    val gqlScript = gql.Ngql.convertScript(ngql)
    // the create flushes once, before the first insert, with props+index
    assert(gqlScript.contains(
      "{create: 'basketballplayer', group: [{player: ['name','age'], index: ['name']},{team: ['name']},{follow: ['degree']},{serve: ['start_year','end_year']}]};"),
      s"unexpected create shape:\n$gqlScript")
    assert(gqlScript.contains("{upset: 'player', vertex: [['player100', {name: 'Tim Duncan', age: 42}]]};"))
    assert(gqlScript.contains("['player101', ->: {degree: 95}, 'player100']"))

    val root = Files.createTempDirectory("ngql").toString
    val engine = new GqlEngine(spark, root)
    val results = engine.exec(gqlScript)
    val bad = results.filter(_.status.startsWith("error"))
    assert(bad.isEmpty, s"converted script errored: ${bad.map(_.status)}\n$gqlScript")

    // converted reads answer correctly against the replayed catalog
    val queries = results.filter(_.df.isDefined).map(_.df.get)
    assert(queries.length == 5)
    def keys(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(r => Option(r.getAs[String]("key_s"))
        .getOrElse(String.valueOf(r.getAs[Any]("neighbor_s")))).toSet
    // go from player101 over follow -> {player100, player102}
    assert(queries(0).collect().map(_.getAs[String]("neighbor_s")).toSet ==
      Set("player100", "player102"))
    // go from player100 over follow reversely -> followers of 100
    assert(queries(1).collect().map(_.getAs[String]("neighbor_s")).toSet ==
      Set("player101", "player102"))
    // fetch prop on player "player100"
    val fetched = queries(2).collect()
    assert(fetched.length == 1 && fetched(0).getAs[String]("name") == "Tim Duncan")
    // lookup age > 35 -> Duncan (42) + Parker (36)
    assert(keys(queries(3)) == Set("player100", "player101"))
    // lookup name == 'Tony Parker'
    assert(keys(queries(4)) == Set("player101"))
  }

  test("nGQL converter corners: quoted separators, multi-line wraps, comments, int vids") {
    // a ','/')'/':' INSIDE a quoted nebula string must not split values;
    // statements wrap across lines; '#' comments separate tokens; bare
    // integer vids stay integer keys (review findings r13)
    val ngql =
      """create space s2(vid_type=int64);
        |use s2;
        |create tag p(name string, note string);
        |insert vertex p(name, note) values # trailing comment
        |  1:("Duncan, Tim (GOAT)", "a:b"),
        |  2:("O'Neal", "x)y");
        |""".stripMargin
    val out = gql.Ngql.convertScript(ngql)
    assert(out.contains("[1, {name: 'Duncan, Tim (GOAT)', note: 'a:b'}]"), out)
    assert(out.contains("""[2, {name: 'O\'Neal', note: 'x)y'}]"""), out)
    // and the converted script executes: quoted separators survive parsing
    val root = Files.createTempDirectory("ngql2").toString
    val engine = new GqlEngine(spark, root)
    val bad = engine.exec(out).filter(_.status.startsWith("error"))
    assert(bad.isEmpty, s"${bad.map(_.status)}\n$out")
    val got = engine.query("{query: 'p', in: 's2'};").collect()
      .map(r => (r.getAs[Long]("key_i"), r.getAs[String]("name"))).toSet
    assert(got == Set((1L, "Duncan, Tim (GOAT)"), (2L, "O'Neal")))
  }
}
