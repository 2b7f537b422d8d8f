package graft.gql

/** AST for the JSON-flavored GQL surface (reference grammar src/gql.y;
  * node taxonomy include/base/type.h:8-44). Statements execute one at a
  * time in script order (gql.y:152-156 interleaves parse and execution —
  * SURVEY.md §7.4 #7). */
object Ast {

  // ---- values --------------------------------------------------------------
  sealed trait GVal
  case class GStr(v: String) extends GVal
  case class GInt(v: Long) extends GVal
  case class GNum(v: Double) extends GVal
  /** `0d<epoch-seconds-or-millis>` datetime literal (src/Type/Datetime.cpp). */
  case class GDatetime(epoch: Long) extends GVal
  /** `0b'BASE64'` binary literal (src/Type/Binary.cpp:11-102). */
  case class GBinary(bytes: Array[Byte]) extends GVal
  case class GArr(items: Seq[GVal]) extends GVal
  case class GObj(fields: Seq[(String, GVal)]) extends GVal
  /** `*` wildcard. */
  case object GStar extends GVal
  /** Lambda `(params) => { ... }` (reference grammar gql.y:936-983).
    * Argument-free lambdas constant-fold at plan time (SURVEY §2.4);
    * parameterized lambdas compile to a per-row Scala-closure UDF with each
    * param bound to the row attribute of the same name. */
  case class GLambda(params: Seq[String], body: Seq[Lambda.Stmt]) extends GVal

  // ---- where predicates ----------------------------------------------------
  sealed trait Pred
  case class Eq(prop: String, v: GVal) extends Pred
  case class In(prop: String, vs: Seq[GVal]) extends Pred
  /** `$gt/$gte/$lt/$lte` bounds; several may combine on one property. */
  case class Range(prop: String, bounds: Seq[(String, GVal)]) extends Pred
  case class IdEq(key: GVal) extends Pred
  /** `{prop: *}` existence. */
  case class Exists(prop: String) extends Pred
  case class And(ps: Seq[Pred]) extends Pred
  case class Or(ps: Seq[Pred]) extends Pred
  /** `{prop: {$near: {$geometry: [...], $lt: r}}}` proximity. */
  case class Near(prop: String, geometry: Seq[Double], op: String, r: Double) extends Pred
  /** `{prop: {limit: k, $near: [v...]}}` — KNN form (E9 via GQL; reference
    * vertex suite "query nearest point"). */
  case class Knn(prop: String, vec: Seq[Double], k: Int) extends Pred
  /** Edge endpoint pattern `[a, ->/<-/--, b]` with `*` wildcards. */
  case class EdgePattern(from: GVal, dir: String, to: GVal) extends Pred
  /** `[a, ->: min('cost'), b]` — min-cost path walk (E4; the reference
    * parses this and returns nothing, PathPlan.cpp:15-17 — implemented
    * properly here). costProp = None means hop count. */
  case class MinPath(from: GVal, dir: String, to: GVal, costProp: Option[String]) extends Pred
  /** `{id: v, --: *, neighbor: 1}`. */
  case class Neighbor(key: GVal, dir: String, hops: Int) extends Pred

  // ---- E3 multi-edge pattern match ----------------------------------------
  /** One vertex slot of a multi-edge walk pattern. The reference grammar
    * accepts multi-edge walks (gql.y:389-433 — `a_walk` chains and
    * `'[' a_simple_graph ']'` walk lists) and routes them to
    * `QueryType::Match` (ScanPlan.cpp:356-362), whose strategy is a stub
    * (CTreeStrategy.cpp) — so, as with E10, the executable semantics are
    * defined here and pinned by GqlSpec: within a MULTI-edge pattern an
    * unquoted identifier is a binding VARIABLE (unified across every slot
    * of the same name, one output column per variable), a quoted string or
    * integer is a concrete vertex key, `*` is an anonymous wildcard, and a
    * `{...}` object is an attribute condition on the vertex at that slot.
    * (Single-edge `[a, ->, b]` keeps the existing [[EdgePattern]] semantics
    * where bare identifiers fold to string keys.) */
  sealed trait MotifV
  case class MVar(name: String) extends MotifV
  case class MKey(v: GVal) extends MotifV
  case object MAny extends MotifV
  case class MCond(pred: Pred) extends MotifV
  /** One hop: `from dir to` with an optional edge-attribute condition
    * (`->: {cost: {$gt: 2}}`). */
  case class MotifEdge(from: MotifV, dir: String, to: MotifV, cond: Option[Pred])
  /** The whole pattern — a conjunction of hops over one edge relation.
    * Result = DISTINCT variable bindings (columns in first-appearance
    * order, normalized string keys); with no variables, one row
    * `(matched: count of walk combinations)`. */
  case class Motif(edges: Seq[MotifEdge]) extends Pred

  // ---- statements ----------------------------------------------------------
  sealed trait Stmt
  /** Group declaration: name, declared props, index list, or edge triple. */
  sealed trait GroupDecl
  case class VertexGroup(name: String, props: Seq[String], index: Seq[String]) extends GroupDecl
  case class EdgeGroup(from: String, name: String, to: String) extends GroupDecl

  case class Create(db: String, groups: Seq[GroupDecl], index: Seq[String]) extends Stmt
  case class UpsetVertex(group: String, rows: Seq[(GVal, GObj)]) extends Stmt
  /** Edge spec: (from, direction, props, to); `<-` normalized at exec time
    * (UpsetPlan.cpp:227-230). `to == None` = self loop decl `[v]`. */
  case class UpsetEdge(group: String, edges: Seq[(GVal, String, Option[GObj], Option[GVal])]) extends Stmt
  case class UpsetProperty(group: String, props: GObj, where: Option[Pred]) extends Stmt
  case class RemoveVertex(group: String, keys: Seq[GVal], where: Option[Pred]) extends Stmt
  case class RemoveEdge(group: String, patterns: Seq[Pred]) extends Stmt
  case class Drop(db: String) extends Stmt
  /** `use graph 'xxx'` — pin a session default graph so later statements
    * may omit `in:` (README.md:275-278; declared but never implemented in
    * the reference — no `use` rule in src/gql.y). */
  case class UseGraph(db: String) extends Stmt
  case class Dump(db: String) extends Stmt
  case class ShowGraph(db: Option[String]) extends Stmt
  case class AstOf(stmt: Stmt) extends Stmt
  /** S11 `profile <query>` — reserved no-op in the reference; here it
    * returns the Catalyst formatted physical plan. */
  case class Profile(stmt: Stmt) extends Stmt
  /** S11 `import <path>` — reserved no-op in the reference (gql.y:224-229
    * frees the path and succeeds; LITERAL_PATH has no lexer rule, so no
    * test exercises it). Here a `.gql` path replays the script at that
    * path — the inverse of [[Dump]] — and any other path keeps the
    * reserved no-op semantics. */
  case class ImportPath(path: String) extends Stmt
  case class Query(target: QueryTarget, in: Option[String], where: Option[Pred]) extends Stmt

  /** E10 inference (README §4.6 `query: hidden_variant`) — a hidden-state
    * chain with weighted emission/transition arcs. The reference DECLARES
    * this surface but never implements it (`src/Graph/DecisionNetwork.cpp`
    * is 0 LoC, `test/decision.cpp` empty-bodied, and `src/gql.y` has no
    * rule for it), so the executable semantics are defined here: see
    * [[GqlEngine]]'s Viterbi evaluation and InferenceSpec. */
  sealed trait InfWeight
  case class WNum(v: Double) extends InfWeight
  /** `gassian(mu, sigma)` (the README's spelling): evaluated as the
    * normal density at the observation when it is numeric, at the mode
    * (1/(σ√2π)) for symbolic observations. */
  case class WGauss(mu: Double, sigma: Double) extends InfWeight
  /** One `[from, {->: w}, to]` where-triple; from/to keep the raw
    * identifiers (`hidden_variant.vK` or an event label). */
  case class InfArc(from: String, weight: InfWeight, to: String)
  case class Inference(events: Seq[(String, GVal)], arcs: Seq[InfArc]) extends Stmt

  sealed trait QueryTarget
  case class GroupTarget(name: String) extends QueryTarget
  case object AllGroups extends QueryTarget
  /** Projection `[g.title, g.genres]` (Q12 — implemented properly here). */
  case class Projection(group: String, props: Seq[String]) extends QueryTarget

  /** Render an AST as an indented tree (S10 `ast` statement — view visitor
    * src/base/lang/ASTNode.cpp analog). */
  def render(v: Any, indent: Int = 0): String = {
    val pad = "  " * indent
    v match {
      case p: Product =>
        val kids = p.productIterator.toSeq
        if (kids.isEmpty) s"$pad${p.productPrefix}"
        else s"$pad${p.productPrefix}\n" + kids.map {
          case s: Seq[_] => s.map(render(_, indent + 1)).mkString("\n")
          case x => render(x, indent + 1)
        }.filter(_.nonEmpty).mkString("\n")
      case s: String => s"$pad'$s'"
      case other => s"$pad$other"
    }
  }
}
