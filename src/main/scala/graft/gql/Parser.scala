package graft.gql

import Ast._
import Lexer._

/** Hand-rolled recursive-descent parser for GQL (offline-deps constraint:
  * SURVEY §7.1 — no parser library). Grammar follows reference src/gql.y;
  * statements separated by `;`. */
class Parser(toks: Vector[Tok]) {
  private var pos = 0
  private def cur: Tok = toks(pos)
  private def advance(): Tok = { val t = cur; pos += 1; t }
  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"GQL parse error at token $pos ($cur): $msg")
  private def expect(p: String): Unit = cur match {
    case TPunct(`p`) => pos += 1
    case other => fail(s"expected '$p', got $other")
  }
  private def isPunct(p: String): Boolean = cur match {
    case TPunct(`p`) => true
    case _ => false
  }
  private def ident(): String = advance() match {
    case TIdent(n) => n
    case other => fail(s"expected identifier, got $other")
  }
  private def str(): String = advance() match {
    case TStr(s) => s
    case other => fail(s"expected string, got $other")
  }

  def statements(): Seq[Stmt] = {
    val out = Seq.newBuilder[Stmt]
    while (cur != TEof) {
      if (isPunct(";")) advance()
      else { out += statement(); if (isPunct(";")) advance() }
    }
    out.result()
  }

  def statement(): Stmt = cur match {
    case TIdent("ast") => advance(); AstOf(statement())
    case TIdent("profile") => advance(); Profile(statement())
    case TIdent("import") =>
      advance()
      cur match {
        case TStr(_) => ImportPath(str())
        case other => fail(s"import needs a quoted path, got $other")
      }
    case TIdent("show") =>
      advance()
      ident() match {
        case "graph" => cur match {
          case TStr(db) => advance(); ShowGraph(Some(db))
          case _ => ShowGraph(None)
        }
        case other => fail(s"show $other not supported")
      }
    case TIdent("use") =>
      advance()
      ident() match {
        case "graph" => cur match {
          case TStr(_) => UseGraph(str())
          case other => fail(s"use graph needs a quoted name, got $other")
        }
        case other => fail(s"use $other not supported")
      }
    case TPunct("{") => braceStatement()
    case other => fail(s"unexpected $other")
  }

  private def braceStatement(): Stmt = {
    expect("{")
    val verb = ident()
    expect(":")
    val st = verb match {
      case "create" => parseCreate()
      case "upset"  => parseUpset()
      case "remove" => parseRemove()
      case "drop"   => Drop(str())
      case "dump"   => Dump(str())
      case "query"  => parseQuery()
      case other    => fail(s"unknown statement '$other'")
    }
    expect("}")
    st
  }

  // {create: 'db', group: [...], index: [...]}
  private def parseCreate(): Stmt = {
    val db = str()
    var groups = Seq.empty[GroupDecl]
    var index = Seq.empty[String]
    while (isPunct(",")) {
      advance()
      ident() match {
        case "group" =>
          expect(":")
          groups = cur match {
            case TStr(_) => Seq(VertexGroup(str(), Nil, Nil))
            case _ => parseArray(parseGroupDecl _)
          }
        case "index" =>
          expect(":")
          index = cur match {
            case TStr(_) => Seq(str())
            case _ => parseArray(() => str())
          }
        case other => fail(s"unknown create clause '$other'")
      }
    }
    Create(db, groups, index)
  }

  // 'g' | {g: [props], index: [...]} | ['from','rel','to']
  private def parseGroupDecl(): GroupDecl = cur match {
    case TStr(_) => VertexGroup(str(), Nil, Nil)
    case TPunct("{") =>
      advance()
      val name = ident()
      expect(":")
      // props: ['a','b'] or a single 'a' (edge suite: {tag: 'name'})
      val props = cur match {
        case TStr(_) => Seq(str())
        case _ => parseArray(() => str())
      }
      var index = Seq.empty[String]
      while (isPunct(",")) {
        advance()
        ident() match {
          case "index" => expect(":"); index = parseArray(() => str())
          case other => fail(s"unknown group clause '$other'")
        }
      }
      expect("}")
      VertexGroup(name, props, index)
    case TPunct("[") =>
      val t = parseArray(() => str())
      if (t.length != 3) fail("edge group needs [from, rel, to]")
      EdgeGroup(t(0), t(1), t(2))
    case other => fail(s"bad group decl: $other")
  }

  // {upset: 'g', vertex: [...]} | {upset:'g', edge: [...]} | {upset:'g', property: {...}, where: {...}}
  private def parseUpset(): Stmt = {
    val group = str()
    expect(",")
    ident() match {
      case "vertex" =>
        expect(":")
        val rows = cur match {
          case TPunct("[") => parseArray(parseVertexRow _)
          case _ => Seq(parseVertexRow())
        }
        UpsetVertex(group, rows)
      case "edge" =>
        expect(":")
        // either [[a, --, b], ...] or a single [a, --, b]
        val edges = parseEdgeSpecList()
        UpsetEdge(group, edges)
      case "property" =>
        expect(":")
        val props = parseValue() match {
          case o: GObj => o
          case other => fail(s"property needs object, got $other")
        }
        var where: Option[Pred] = None
        while (isPunct(",")) {
          advance()
          ident() match {
            case "where" => expect(":"); where = Some(parseWhere())
            case other => fail(s"unknown upset clause '$other'")
          }
        }
        UpsetProperty(group, props, where)
      case other => fail(s"unknown upset kind '$other'")
    }
  }

  // [id, {props}] | [id] | id | 'id'
  private def parseVertexRow(): (GVal, GObj) = cur match {
    case TPunct("[") =>
      advance()
      val key = parseValue()
      val props = if (isPunct(",")) { advance(); parseValue() } else GObj(Nil)
      expect("]")
      props match {
        case o: GObj => (key, o)
        case other => fail(s"vertex props must be object, got $other")
      }
    case _ => (parseValue(), GObj(Nil))
  }

  /** Edge list: the outer array may itself be a single edge triple
    * (`edge: ['a', --, 1]`) or a list of triples. */
  private def parseEdgeSpecList(): Seq[(GVal, String, Option[GObj], Option[GVal])] = {
    expect("[")
    // Lookahead: inner '[' means list-of-triples
    val specs = Seq.newBuilder[(GVal, String, Option[GObj], Option[GVal])]
    if (isPunct("[")) {
      var done = false
      while (!done) {
        expect("[")
        specs += parseEdgeSpecBody()
        expect("]")
        if (isPunct(",")) advance() else done = true
      }
    } else specs += parseEdgeSpecBody()
    expect("]")
    specs.result()
  }

  // a, --/->/<-[: {props}], b   |   a   (self marker)
  private def parseEdgeSpecBody(): (GVal, String, Option[GObj], Option[GVal]) = {
    val from = parseValue()
    if (isPunct("]")) (from, "--", None, None)
    else {
      expect(",")
      val dir = advance() match {
        case TPunct(d @ ("--" | "->" | "<-")) => d
        case other => fail(s"expected edge direction, got $other")
      }
      val props = if (isPunct(":")) {
        advance()
        parseValue() match {
          case o: GObj => Some(o)
          case Ast.GLambda(_, _) => None // min() walk conditions parse as call — not stored
          case _ => None
        }
      } else None
      expect(",")
      val to = parseValue()
      (from, dir, props, Some(to))
    }
  }

  // {remove: 'g', vertex: [...] | where-pred} | {remove: 'g', edge: [...]}
  private def parseRemove(): Stmt = {
    val group = str()
    expect(",")
    ident() match {
      case "vertex" =>
        expect(":")
        cur match {
          case TPunct("[") => RemoveVertex(group, parseArray(parseValue _), None)
          case TPunct("{") => RemoveVertex(group, Nil, Some(parseWhere()))
          case _ => RemoveVertex(group, Seq(parseValue()), None)
        }
      case "edge" =>
        expect(":")
        val specs = parseEdgeSpecList()
        RemoveEdge(group, specs.map { case (f, d, _, t) =>
          EdgePattern(f, d, t.getOrElse(GStar))
        })
      case other => fail(s"unknown remove kind '$other'")
    }
  }

  // {query: 'g' | '*' | [g.prop...], in: 'db', where: ...}
  private def parseQuery(): Stmt = {
    cur match {
      // E10: `query: hidden_variant, event: [...], where: [[...], ...]`
      case TIdent("hidden_variant") => advance(); return parseInference()
      case _ =>
    }
    val target: QueryTarget = cur match {
      case TStr("*") => advance(); AllGroups
      case TStr(_) => GroupTarget(str())
      case TPunct("[") =>
        val members = parseArray(() => ident())
        val split = members.map { m =>
          val dot = m.indexOf('.')
          if (dot < 0) fail(s"projection member '$m' needs group.prop")
          (m.substring(0, dot), m.substring(dot + 1))
        }
        Projection(split.head._1, split.map(_._2))
      case other => fail(s"bad query target $other")
    }
    var in: Option[String] = None
    var where: Option[Pred] = None
    while (isPunct(",")) {
      advance()
      ident() match {
        case "in" =>
          expect(":")
          cur match {
            case TStr(_) => in = Some(str())
            case TPunct("{") => // nested query as source: execute inner, keep its `in`
              braceStatement() match {
                case Query(_, innerIn, _) => in = innerIn
                case _ => fail("nested in: must be a query")
              }
            case other => fail(s"bad in: $other")
          }
        case "where" => expect(":"); where = Some(parseWhere())
        case other => fail(s"unknown query clause '$other'")
      }
    }
    Query(target, in, where)
  }

  /** E10 inference body after `query: hidden_variant` — the `event:`
    * observation list and the `where:` arc triples. */
  private def parseInference(): Stmt = {
    var events = Seq.empty[(String, GVal)]
    var arcs = Seq.empty[InfArc]
    while (isPunct(",")) {
      advance()
      ident() match {
        case "event" =>
          expect(":")
          events = parseArray { () =>
            expect("{"); val label = ident(); expect(":")
            val v = parseValue(); expect("}")
            (label, v)
          }
        case "where" =>
          expect(":")
          arcs = parseArray { () =>
            expect("["); val from = ident(); expect(",")
            expect("{"); expect("->"); expect(":")
            val w = cur match {
              case TIdent("gassian") | TIdent("gaussian") =>
                advance(); expect("(")
                val mu = parseValue(); expect(",")
                val sigma = parseValue(); expect(")")
                def num(v: GVal): Double = v match {
                  case GNum(x) => x
                  case GInt(x) => x.toDouble
                  case other   => fail(s"gassian needs numeric args, got $other")
                }
                val sig = num(sigma)
                if (sig <= 0) fail(s"gassian sigma must be > 0, got $sig")
                WGauss(num(mu), sig)
              case _ => parseValue() match {
                case GNum(x) => WNum(x)
                case GInt(x) => WNum(x.toDouble)
                case other   => fail(s"arc weight must be numeric, got $other")
              }
            }
            expect("}"); expect(",")
            val to = ident(); expect("]")
            InfArc(from, w, to)
          }
        case other => fail(s"unknown inference clause '$other'")
      }
    }
    if (events.isEmpty) fail("inference needs an event: observation list")
    if (arcs.isEmpty) fail("inference needs where: arcs")
    Inference(events, arcs)
  }

  /** E3: count direction tokens at depth 1 inside the bracket at `cur`
    * (nested `{...}`/`[...]`/`(...)` raise the depth, so a connection
    * condition object cannot miscount). ≥2 means the bracket is a
    * multi-edge walk chain → Match semantics. */
  private def edgesAhead(): Int = {
    var i = pos
    var depth = 0
    var count = 0
    var run = true
    while (run && i < toks.length) {
      toks(i) match {
        case TPunct("[") | TPunct("{") | TPunct("(") => depth += 1
        case TPunct("]") | TPunct("}") | TPunct(")") =>
          depth -= 1; if (depth == 0) run = false
        case TPunct("->") | TPunct("<-") | TPunct("--") if depth == 1 => count += 1
        case _ =>
      }
      i += 1
    }
    count
  }

  /** E3 vertex slot: bare identifier = binding variable, quoted string /
    * int = concrete key, `*` = anonymous, `{...}` = attribute condition
    * (see Ast.MotifV — semantics defined here, reference stubs Match). */
  private def parseMotifVertex(): MotifV = cur match {
    case TPunct("*") => advance(); MAny
    case TPunct("{") => MCond(parseWhere())
    case TIdent(_) => MVar(ident())
    case _ => MKey(parseValue())
  }

  /** One bracketed walk `[v, d, v, d, v, ...]` (gql.y a_walk: a vertex
    * chain alternating with connections; a connection may carry an edge
    * condition `->: {prop: ...}`). */
  private def parseMotifWalk(): Seq[MotifEdge] = {
    expect("[")
    val edges = Seq.newBuilder[MotifEdge]
    var from = parseMotifVertex()
    var done = false
    while (!done) {
      expect(",")
      val dir = advance() match {
        case TPunct(d @ ("--" | "->" | "<-")) => d
        case other => fail(s"expected direction, got $other")
      }
      val cond = if (isPunct(":")) {
        advance()
        cur match {
          case TPunct("{") => Some(parseWhere())
          case _ => parseValue(); None // calls like min() — not a walk condition
        }
      } else None
      expect(",")
      val to = parseMotifVertex()
      edges += MotifEdge(from, dir, to, cond)
      from = to
      if (isPunct("]")) { advance(); done = true }
    }
    edges.result()
  }

  /** where: object predicate bank or edge pattern array. */
  def parseWhere(): Pred = cur match {
    // E3 walk-list form `[[a,->,b],[b,->,c]]` (gql.y:451 '[' a_simple_graph ']')
    case TPunct("[") if toks(pos + 1) == TPunct("[") =>
      advance()
      val walks = Seq.newBuilder[Seq[MotifEdge]]
      walks += parseMotifWalk()
      while (isPunct(",")) { advance(); walks += parseMotifWalk() }
      expect("]")
      Motif(walks.result().flatten)
    // E3 single-walk chain `[a, ->, b, ->, c]` (≥2 connections)
    case TPunct("[") if edgesAhead() >= 2 =>
      Motif(parseMotifWalk())
    case TPunct("[") =>
      advance()
      val from = parseValue()
      expect(",")
      val dir = advance() match {
        case TPunct(d @ ("--" | "->" | "<-")) => d
        case other => fail(s"expected direction, got $other")
      }
      // walk condition: `->: min()` / `->: min('distance')` = min-cost path
      var minCost: Option[Option[String]] = None
      if (isPunct(":")) {
        advance()
        cur match {
          case TIdent("min") =>
            advance(); expect("(")
            val prop = cur match {
              case TStr(_) => Some(str())
              case _ => None
            }
            expect(")")
            minCost = Some(prop)
          case _ => parseValue() // other conditions parsed, unused
        }
      }
      expect(",")
      val to = parseValue()
      expect("]")
      minCost match {
        case Some(prop) => MinPath(from, dir, to, prop)
        case None => EdgePattern(from, dir, to)
      }
    case TPunct("{") =>
      advance()
      val preds = Seq.newBuilder[Pred]
      var idKey: Option[GVal] = None
      var dirOpt: Option[String] = None
      var neighbor: Option[Int] = None
      var done = false
      while (!done) {
        cur match {
          case TPunct("}") => done = true
          case TPunct(",") => advance()
          case TPunct(d @ ("--" | "->" | "<-")) =>
            advance(); expect(":"); parseValue(); dirOpt = Some(d)
          case TIdent(name) =>
            advance()
            expect(":")
            name match {
              case "$and" => preds += And(parseArray(parseWhere _))
              case "$or"  => preds += Or(parseArray(parseWhere _))
              case "id"   => idKey = Some(parseValue())
              case "neighbor" => parseValue() match {
                case GInt(k) => neighbor = Some(k.toInt)
                case other => fail(s"neighbor needs int, got $other")
              }
              case prop => preds += parsePropPred(prop)
            }
          case other => fail(s"bad where clause $other")
        }
      }
      expect("}")
      (idKey, neighbor) match {
        case (Some(k), Some(h)) => Neighbor(k, dirOpt.getOrElse("--"), h)
        case (Some(k), None) if preds.result().isEmpty => IdEq(k)
        case (Some(k), None) => And(IdEq(k) +: preds.result())
        case (None, _) =>
          val ps = preds.result()
          if (ps.length == 1) ps.head else And(ps)
      }
    case other => fail(s"bad where $other")
  }

  /** prop: literal | [in-list] | * | {$gt.. bounds | $near} */
  private def parsePropPred(prop: String): Pred = cur match {
    case TPunct("*") => advance(); Exists(prop)
    case TPunct("[") => In(prop, parseArray(parseValue _))
    case TPunct("{") =>
      advance()
      val bounds = Seq.newBuilder[(String, GVal)]
      var near: Option[Pred] = None
      var nearVec: Option[Seq[Double]] = None
      var limitK: Option[Int] = None
      var done = false
      while (!done) {
        cur match {
          case TPunct("}") => done = true
          case TPunct(",") => advance()
          case TIdent("limit") =>
            advance(); expect(":")
            parseValue() match {
              case GInt(k) => limitK = Some(k.toInt)
              case other => fail(s"limit needs int, got $other")
            }
          case TIdent("$near") =>
            advance(); expect(":")
            if (isPunct("[")) {
              // bare vector form = KNN (paired with limit:)
              nearVec = Some(parseArray(parseValue _).map(toDouble))
            } else {
              expect("{")
              var geom = Seq.empty[Double]
              var op = "$lt"; var r = 0.0
              var ndone = false
              while (!ndone) {
                cur match {
                  case TPunct("}") => ndone = true
                  case TPunct(",") => advance()
                  case TIdent("$geometry") =>
                    advance(); expect(":")
                    geom = parseArray(parseValue _).map(toDouble)
                  case TIdent(o @ ("$lt" | "$lte" | "$gt" | "$gte")) =>
                    advance(); expect(":"); op = o; r = toDouble(parseValue())
                  case other => fail(s"bad \\$$near clause $other")
                }
              }
              expect("}")
              near = Some(Near(prop, geom, op, r))
            }
          case TIdent(o @ ("$lt" | "$lte" | "$gt" | "$gte")) =>
            advance(); expect(":")
            val v = parseValue() match {
              case l @ GLambda(Nil, body) =>
                // Q11: constant-fold argument-free lambdas at plan time
                // (SURVEY §2.4). A body with no `return` keeps the lambda:
                // the execution path yields a NULL operand, so the bound
                // never matches (a NaN literal here would MATCH every $lt
                // row — Spark orders NaN above all doubles)
                Lambda.eval(body) match {
                  case Some(d) => GNum(d)
                  case None => l
                }
              // parameterized lambda: defer to execution (closure UDF,
              // params bound per row — see GqlEngine.lambdaBound)
              case l: GLambda => l
              case v => v
            }
            bounds += (o -> v)
          case other => fail(s"bad bound $other")
        }
      }
      expect("}")
      nearVec match {
        case Some(v) => Knn(prop, v, limitK.getOrElse(1))
        case None => near.getOrElse(Range(prop, bounds.result()))
      }
    case _ => Eq(prop, parseValue())
  }

  private def toDouble(v: GVal): Double = v match {
    case GNum(d) => d
    case GInt(l) => l.toDouble
    case other => throw new IllegalArgumentException(s"expected number, got $other")
  }

  private def parseArray[T](item: () => T): Seq[T] = {
    expect("[")
    val out = Seq.newBuilder[T]
    if (!isPunct("]")) {
      out += item()
      while (isPunct(",")) { advance(); out += item() }
    }
    expect("]")
    out.result()
  }

  /** Value literal — including nested objects/arrays, 0d/0b, `*`, lambdas
    * and bare identifiers used as walk endpoints. */
  def parseValue(): GVal = cur match {
    case TStr(_) =>
      val s = str()
      // the reference accepts datetimes smuggled in strings ('0d16005...')
      // and re-types them on write — normalize here
      if (s.length > 2 && s.startsWith("0d") && s.drop(2).forall(_.isDigit))
        GDatetime(s.drop(2).toLong)
      else GStr(s)
    case TInt(_) => val TInt(v) = advance(): @unchecked; GInt(v)
    case TNum(_) => val TNum(v) = advance(): @unchecked; GNum(v)
    case TDatetime(_) => val TDatetime(e) = advance(): @unchecked; GDatetime(e)
    case TBinary(_) =>
      val TBinary(b) = advance(): @unchecked
      GBinary(java.util.Base64.getDecoder.decode(b))
    case THash(_) =>
      // "hash: a special type of string" (reference README.md:139) — it
      // stores as its string rendering; spatial ops decode on demand
      val THash(h) = advance(): @unchecked
      GStr(h)
    case TPunct("*") => advance(); GStar
    case TPunct("[") => GArr(parseArray(parseValue _))
    case TPunct("{") =>
      advance()
      val fields = Seq.newBuilder[(String, GVal)]
      if (!isPunct("}")) {
        var done = false
        while (!done) {
          val k = advance() match {
            case TIdent(n) => n
            case TStr(s) => s
            case other => fail(s"bad object key $other")
          }
          expect(":")
          fields += (k -> parseValue())
          if (isPunct(",")) advance() else done = true
        }
      }
      expect("}")
      GObj(fields.result())
    case TPunct("(") =>
      // (a, b) => { ... } lambda (params optional — gql.y:941-945)
      advance()
      val params = Seq.newBuilder[String]
      if (!isPunct(")")) {
        params += ident()
        while (isPunct(",")) { advance(); params += ident() }
      }
      expect(")")
      expect("=>")
      GLambda(params.result(), parseLambdaBlock())
    case TIdent(name) =>
      advance()
      if (isPunct("(")) { // call like min() — treated as empty lambda marker
        advance()
        // paren-depth aware skip: nested calls like min(f(x)) must not
        // terminate on the inner ')'
        var depth = 0
        while ((depth > 0 || !isPunct(")")) && cur != TEof) {
          if (isPunct("(")) depth += 1
          else if (isPunct(")")) depth -= 1
          advance()
        }
        if (cur == TEof) fail("unterminated call argument list")
        advance()
        GLambda(Nil, Nil)
      } else if (name.length > 1 && name.head == 'd' && name.tail.forall(_.isDigit))
        try GDatetime(name.tail.toLong) // bare d<epoch> form (vertex suite)
        catch { case _: NumberFormatException =>
          fail(s"datetime literal out of range '$name'") }
      else GStr(name)
    case other => fail(s"bad value $other")
  }

  // ---- lambda mini-language ------------------------------------------------

  private def parseLambdaBlock(): Seq[Lambda.Stmt] = {
    expect("{")
    val out = Seq.newBuilder[Lambda.Stmt]
    while (!isPunct("}")) {
      if (isPunct(";")) advance()
      else out += parseLambdaStmt()
    }
    expect("}")
    out.result()
  }

  private def parseLambdaStmt(): Lambda.Stmt = cur match {
    case TIdent("let") =>
      advance()
      val n = ident()
      expect("=")
      Lambda.Let(n, parseLambdaExpr())
    case TIdent("return") =>
      advance()
      Lambda.Return(parseLambdaExpr())
    case TIdent(n) if toks(pos + 1) == TPunct("=") && toks(pos + 2) != TPunct(">") =>
      advance(); advance()
      Lambda.Assign(n, parseLambdaExpr())
    case _ => Lambda.ExprStmt(parseLambdaExpr())
  }

  // precedence: addsub > muldiv > primary
  private def parseLambdaExpr(): Lambda.Expr = {
    var l = parseMulDiv()
    var done = false
    while (!done) cur match {
      case TPunct(op @ ("+" | "-")) =>
        advance(); l = Lambda.Bin(op.head, l, parseMulDiv())
      case _ => done = true
    }
    l
  }

  private def parseMulDiv(): Lambda.Expr = {
    var l = parseLambdaPrimary()
    var done = false
    while (!done) cur match {
      case TPunct("*") => advance(); l = Lambda.Bin('*', l, parseLambdaPrimary())
      case TPunct("/") => advance(); l = Lambda.Bin('/', l, parseLambdaPrimary())
      case _ => done = true
    }
    l
  }

  private def parseLambdaPrimary(): Lambda.Expr = cur match {
    case TInt(_) => val TInt(v) = advance(): @unchecked; Lambda.Num(v.toDouble)
    case TNum(_) => val TNum(v) = advance(): @unchecked; Lambda.Num(v)
    case TStr(_) => Lambda.Str(str())
    case TPunct("(") =>
      advance()
      if (isPunct(")")) { // nested lambda () => {...}
        advance(); expect("=>")
        Lambda.Fn(parseLambdaBlock())
      } else {
        val e = parseLambdaExpr()
        expect(")")
        e
      }
    case TIdent(name) =>
      advance()
      if (isPunct("(")) {
        advance()
        val args = Seq.newBuilder[Lambda.Expr]
        if (!isPunct(")")) {
          args += parseLambdaExpr()
          while (isPunct(",")) { advance(); args += parseLambdaExpr() }
        }
        expect(")")
        Lambda.Call(name, args.result())
      } else Lambda.Ref(name)
    case other => fail(s"bad lambda expression $other")
  }
}

object Parser {
  def parse(gql: String): Seq[Ast.Stmt] =
    new Parser(Lexer.tokenize(gql)).statements()

  /** Split a script into statement chunks at top-level `;` (string-,
    * comment- and nesting-aware: a `;` inside a lambda body or string does
    * not split). Lets the executor run statement-at-a-time with
    * per-statement error isolation, like the reference's interleaved
    * parse/execute loop (gql.y:152-156). */
  def splitStatements(script: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var depth = 0
    var inStr = false
    var inComment = false
    var i = 0
    while (i < script.length) {
      val c = script.charAt(i)
      if (inComment) { if (c == '\n') inComment = false; sb.append(c) }
      else if (inStr) {
        sb.append(c)
        if (c == '\\' && i + 1 < script.length) { sb.append(script.charAt(i + 1)); i += 1 }
        else if (c == '\'') inStr = false
      } else c match {
        case '\'' => inStr = true; sb.append(c)
        case '/' if i + 1 < script.length && script.charAt(i + 1) == '/' =>
          inComment = true; sb.append(c)
        case '{' | '[' | '(' => depth += 1; sb.append(c)
        case '}' | ']' | ')' => depth -= 1; sb.append(c)
        case ';' if depth == 0 =>
          val s = sb.toString.trim
          if (s.nonEmpty) out += s
          sb.clear()
        case _ => sb.append(c)
      }
      i += 1
    }
    val tail = sb.toString.trim
    if (tail.nonEmpty) out += tail
    out.result()
  }

  /** True when `script` ends INSIDE an unterminated statement — open
    * bracket nesting, an open string literal, or non-comment content after
    * the last top-level `;`. The interactive shell's continuation-prompt
    * test (same scanner as [[splitStatements]], so the two can't disagree
    * about where statements end). */
  def incomplete(script: String): Boolean = {
    var depth = 0
    var inStr = false
    var inComment = false
    val tail = new StringBuilder
    var i = 0
    while (i < script.length) {
      val c = script.charAt(i)
      if (inComment) { if (c == '\n') inComment = false }
      else if (inStr) {
        if (c == '\\' && i + 1 < script.length) i += 1
        else if (c == '\'') inStr = false
        tail.append(c)
      } else c match {
        case '\'' => inStr = true; tail.append(c)
        case '/' if i + 1 < script.length && script.charAt(i + 1) == '/' =>
          inComment = true
        case '{' | '[' | '(' => depth += 1; tail.append(c)
        case '}' | ']' | ')' => depth -= 1; tail.append(c)
        case ';' if depth == 0 => tail.clear()
        case other => tail.append(other)
      }
      i += 1
    }
    depth > 0 || inStr || tail.toString.trim.nonEmpty
  }
}
