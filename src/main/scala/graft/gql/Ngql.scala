package graft.gql

/** nGQL → GQL converter — the Spark-side rendering of the reference's
  * `l2lite` tool (/root/reference/tool/l2lite.cpp driving
  * tool/converter/ngql.cpp): translate the nebula-graph statement subset
  * the reference converter recognizes (drop/create space, create
  * tag/edge, create tag index, insert vertex/edge, `use`/`:sleep`
  * skipped) into executable GQL, with the same output shapes
  * (`{create: ...}` with per-group prop/index lists, `{upset: ...}`
  * batches, quoted keys, `\'`-escaped strings).
  *
  * Beyond the reference (whose converter stops at DML), the read-side
  * basketballplayer dialect also translates, so a converted script is
  * USABLE end-to-end (BasketballSpec replays one against the engine):
  *  - `GO FROM "v" OVER e [REVERSELY]` → the 1-hop neighbor query
  *    `{query: 'e', in: db, where: {id: 'v', ->/<-: *, neighbor: 1}}`
  *  - `FETCH PROP ON g "v"`            → `{query: 'g', in: db, where: {id: 'v'}}`
  *  - `LOOKUP ON g WHERE g.p == x` (and >, >=, <, <=) →
  *    `{query: 'g', in: db, where: {p: x}}` / range forms.
  */
object Ngql {

  /** Stateful converter (the reference's NGQLConverter shape): `create
    * space` + following tag/edge/index declarations accumulate until the
    * first non-DDL statement flushes one `{create: ...}`. */
  final class Converter {
    private var creation: Option[String] = None
    /** Current space — `in:` target for converted queries. */
    private var space: Option[String] = None
    private val groups =
      scala.collection.mutable.LinkedHashMap.empty[String, (Seq[String], Seq[String])]

    // (?s): nebula scripts wrap long inserts across lines and
    // convertScript only splits on ';' — `.` must cross newlines or a
    // wrapped statement silently falls to the drop-everything default
    private val reDrop = """(?is)\s*drop\s+space\s+(\w+)\s*""".r
    private val reSpace = """(?is)\s*create\s+space\s+(\w+)\s*\(.*\)\s*""".r
    private val reTag = """(?is)\s*create\s+(?:tag|edge)\s+(\w+)\s*\(([^)]*)\)\s*""".r
    private val reIndex = """(?is)\s*create\s+tag\s+index\s+\w+\s+on\s+(\w+)\s*\((.*)\)\s*""".r
    private val reUse = """(?is)\s*use\s+(\w+)\s*""".r
    private val reSleep = """(?s)\s*:sleep.*""".r
    private val reInsV = """(?is)\s*insert\s+vertex\s+(\w+)\s*\(([^)]*)\)\s+values\s+(.+)\s*""".r
    private val reInsE = """(?is)\s*insert\s+edge\s+(\w+)\s*\(([^)]*)\)\s+values\s+(.+)\s*""".r
    private val reGo = """(?is)\s*go\s+from\s+"([^"]+)"\s+over\s+(\w+)(\s+reversely)?\s*""".r
    private val reFetch = """(?is)\s*fetch\s+prop\s+on\s+(\w+)\s+"([^"]+)"\s*""".r
    private val reLookup =
      """(?is)\s*lookup\s+on\s+(\w+)\s+where\s+(\w+)\.(\w+)\s*(==|>=|<=|>|<)\s*(.+?)\s*""".r

    private def quote(s: String): String = "'" + s.replace("'", "\\'") + "'"

    /** nGQL literal → GQL literal: `"str"` requotes (escaping `'`),
      * numbers pass through. */
    private def lit(v0: String): String = {
      val v = v0.trim
      if (v.length >= 2 && v.head == '"' && v.last == '"')
        quote(v.substring(1, v.length - 1))
      else v
    }

    /** Vertex id → GQL key: quoted nebula vids requote, bare (int) vids
      * pass through. */
    private def keyLit(raw0: String): String = {
      val raw = raw0.trim
      if (raw.length >= 2 && raw.head == '"' && raw.last == '"')
        quote(raw.substring(1, raw.length - 1))
      else raw
    }

    // ---- quote-aware scanners (a comma/paren/colon INSIDE a nebula
    // string literal must not split — "Duncan, Tim" is one value) -------
    /** Split on `sep` at paren depth 0, outside double-quoted strings. */
    private def splitTop(s: String, sep: Char): Seq[String] = {
      val out = Seq.newBuilder[String]
      val sb = new StringBuilder
      var depth = 0
      var inStr = false
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (inStr) {
          sb.append(c)
          if (c == '\\' && i + 1 < s.length) { sb.append(s.charAt(i + 1)); i += 1 }
          else if (c == '"') inStr = false
        } else c match {
          case '"' => inStr = true; sb.append(c)
          case '(' => depth += 1; sb.append(c)
          case ')' => depth -= 1; sb.append(c)
          case x if x == sep && depth == 0 => out += sb.toString; sb.clear()
          case other => sb.append(other)
        }
        i += 1
      }
      out += sb.toString
      out.result()
    }

    /** Split one values pair `<lhs>:(<tuple>)` at the first top-level
      * colon; returns (lhs, tuple-contents). */
    private def splitPair(pair: String): (String, String) = {
      var inStr = false
      var i = 0
      while (i < pair.length) {
        val c = pair.charAt(i)
        if (inStr) { if (c == '\\') i += 1 else if (c == '"') inStr = false }
        else if (c == '"') inStr = true
        else if (c == ':') {
          val rhs = pair.substring(i + 1).trim
          if (!(rhs.startsWith("(") && rhs.endsWith(")")))
            throw new IllegalArgumentException(s"values tuple expected after ':' in: $pair")
          return (pair.substring(0, i), rhs.substring(1, rhs.length - 1))
        }
        i += 1
      }
      throw new IllegalArgumentException(s"values pair needs ':(': $pair")
    }

    /** Split an edge endpoint pair at its direction token (outside
      * strings): `"a"->"b"@0` → ("\"a\"", "->", "\"b\""). The optional
      * `@rank` suffix strips from the destination. */
    private def splitArrow(lhs: String): (String, String, String) = {
      var inStr = false
      var i = 0
      while (i < lhs.length - 1) {
        val c = lhs.charAt(i)
        if (inStr) { if (c == '\\') i += 1 else if (c == '"') inStr = false }
        else if (c == '"') inStr = true
        else {
          val two = lhs.substring(i, i + 2)
          if (two == "->" || two == "<-" || two == "--") {
            var to = lhs.substring(i + 2)
            // strip @rank (outside strings)
            var j = 0; var s2 = false; var at = -1
            while (j < to.length && at < 0) {
              val c2 = to.charAt(j)
              if (s2) { if (c2 == '\\') j += 1 else if (c2 == '"') s2 = false }
              else if (c2 == '"') s2 = true
              else if (c2 == '@') at = j
              j += 1
            }
            if (at >= 0) to = to.substring(0, at)
            return (lhs.substring(0, i), two, to)
          }
        }
        i += 1
      }
      throw new IllegalArgumentException(s"edge pair needs a direction: $lhs")
    }

    private def propNames(decl: String): Seq[String] =
      decl.split(",").map(_.trim).filter(_.nonEmpty).map(_.split("""[\s(]+""")(0))

    /** The pending `{create: ...}` statement, if any DDL accumulated. */
    private def flushCreate(): Seq[String] = creation match {
      case None => Nil
      case Some(db) =>
        creation = None
        val gs = groups.map { case (name, (props, idx)) =>
          val ip = if (idx.nonEmpty) s", index: [${idx.map(quote).mkString(",")}]" else ""
          if (props.nonEmpty) s"{$name: [${props.map(quote).mkString(",")}]$ip}"
          else quote(name)
        }.mkString(",")
        groups.clear()
        Seq(s"{create: ${quote(db)}, group: [$gs]};")
    }

    /** Convert one nGQL statement (no trailing `;`); DDL may return Nil
      * while accumulating — call [[flush]] at end of script. */
    def convert(stmt: String): Seq[String] = stmt match {
      case reDrop(db) => flushCreate() :+ s"{drop: ${quote(db)}};"
      case reSpace(db) => creation = Some(db); space = Some(db); Nil
      case reIndex(g, cols) => // (must match before the generic tag/edge rule)
        val idx = propNames(cols)
        groups.get(g).foreach { case (p, _) => groups(g) = (p, idx) }
        Nil
      case reTag(name, decl) => groups(name) = (propNames(decl), Nil); Nil
      // use/:sleep skip WITHOUT flushing — in nebula scripts they sit
      // between `create space` and the tag/edge declarations (the
      // reference checks them before its pending-create flush too)
      case reUse(db) => space = Some(db); Nil
      case reSleep() => Nil
      case reInsV(g, cols, values) =>
        val props = propNames(cols)
        // "id":(v1, v2)[, "id2":(...)]* — the reference handles one pair;
        // batches split here so nebula's multi-value inserts convert too.
        // All splitting is quote-aware: a ','/')'/':' inside a string
        // value must not cut the tuple (review finding r13)
        val rows = splitTop(values, ',').map(_.trim).filter(_.nonEmpty).map { p =>
          val (idPart, tuple) = splitPair(p)
          val vs = splitTop(tuple, ',').map(lit)
          val body = props.zip(vs).map { case (n, v) => s"$n: $v" }.mkString(", ")
          s"[${keyLit(idPart)}, {$body}]"
        }.mkString(", ")
        flushCreate() :+ s"{upset: ${quote(g)}, vertex: [$rows]};"
      case reInsE(g, cols, values) =>
        val props = propNames(cols)
        val rows = splitTop(values, ',').map(_.trim).filter(_.nonEmpty).map { p =>
          val (lhs, tuple) = splitPair(p)
          val (from, dir, to) = splitArrow(lhs)
          val vs = splitTop(tuple, ',').map(lit).filter(_.nonEmpty)
          val body =
            if (props.isEmpty || vs.isEmpty) ""
            else s": {${props.zip(vs).map { case (n, v) => s"$n: $v" }.mkString(", ")}}"
          s"[${keyLit(from)}, $dir$body, ${keyLit(to)}]"
        }.mkString(", ")
        flushCreate() :+ s"{upset: ${quote(g)}, edge: [$rows]};"
      case reGo(v, e, rev) =>
        val dir = if (rev != null) "<-" else "->"
        flushCreate() :+
          s"{query: ${quote(e)}$inClause, where: {id: ${quote(v)}, $dir: *, neighbor: 1}};"
      case reFetch(g, v) =>
        flushCreate() :+ s"{query: ${quote(g)}$inClause, where: {id: ${quote(v)}}};"
      case reLookup(g, _, p, op, v) =>
        val cond = op match {
          case "==" => s"$p: ${lit(v)}"
          case ">"  => s"$p: {$$gt: ${lit(v)}}"
          case ">=" => s"$p: {$$gte: ${lit(v)}}"
          case "<"  => s"$p: {$$lt: ${lit(v)}}"
          case "<=" => s"$p: {$$lte: ${lit(v)}}"
        }
        flushCreate() :+ s"{query: ${quote(g)}$inClause, where: {$cond}};"
      case other if other.trim.isEmpty => Nil
      case other =>
        // reference converter: unrecognized statements convert to nothing
        flushCreate()
    }

    private def inClause: String =
      space.map(db => s", in: ${quote(db)}").getOrElse("")

    /** Emit any still-pending create (script ended inside DDL). */
    def flush(): Seq[String] = flushCreate()
  }

  /** Whole-script conversion: split on `;` (quote-aware — a `;` inside a
    * double-quoted nebula string does not split), convert each statement
    * in order. */
  def convertScript(ngql: String): String = {
    val c = new Converter
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var inStr = false
    var i = 0
    while (i < ngql.length) {
      val ch = ngql.charAt(i)
      if (inStr) {
        sb.append(ch)
        if (ch == '\\' && i + 1 < ngql.length) { sb.append(ngql.charAt(i + 1)); i += 1 }
        else if (ch == '"') inStr = false
      } else ch match {
        case '"' => inStr = true; sb.append(ch)
        case '#' => // comment to end of line; keep a separator so the
          // tokens flanking the comment don't glue together
          while (i < ngql.length && ngql.charAt(i) != '\n') i += 1
          sb.append(' ')
        case ';' => out ++= c.convert(sb.toString); sb.clear()
        case _ => sb.append(ch)
      }
      i += 1
    }
    if (sb.toString.trim.nonEmpty) out ++= c.convert(sb.toString)
    out ++= c.flush()
    out.result().mkString("\n")
  }
}
