package graft.gql

/** Tokenizer for GQL (reference lexer src/gql.l). Unicode identifiers are
  * legal group names (the reference suites use CJK names); `0d`/`0b`
  * literals, `$`-keywords, arrows and the lambda operator are single
  * tokens. `//` comments run to end of line. */
object Lexer {
  sealed trait Tok
  case class TStr(v: String) extends Tok
  case class TInt(v: Long) extends Tok
  case class TNum(v: Double) extends Tok
  case class TDatetime(epoch: Long) extends Tok
  case class TBinary(b64: String) extends Tok
  case class THash(h: String) extends Tok
  case class TIdent(name: String) extends Tok // includes $keywords
  case class TPunct(c: String) extends Tok    // { } [ ] ( ) : , ; * -> <- -- =>
  case object TEof extends Tok

  case class LexError(msg: String) extends RuntimeException(msg)

  def tokenize(input: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = input.length
    def peek(k: Int = 0): Char = if (i + k < n) input.charAt(i + k) else ' '
    // true when the previous token can END a value — then a following '-'
    // is binary minus (lambda `10-2`), not a negative-literal sign
    var prevEndsValue = false
    def emit(t: Tok): Unit = {
      prevEndsValue = t match {
        case TInt(_) | TNum(_) | TStr(_) | TDatetime(_) | TBinary(_) | THash(_) | TIdent(_) => true
        case TPunct(")") | TPunct("]") | TPunct("}") => true
        case _ => false
      }
      out += t
    }
    while (i < n) {
      val c = input.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '/' && peek(1) == '/') { while (i < n && input.charAt(i) != '\n') i += 1 }
      else if (c == '\'') {
        val sb = new StringBuilder
        i += 1
        var done = false
        while (!done) {
          if (i >= n) throw LexError("unterminated string")
          val ch = input.charAt(i)
          if (ch == '\\' && i + 1 < n) { sb.append(input.charAt(i + 1)); i += 2 }
          else if (ch == '\'') { i += 1; done = true }
          else { sb.append(ch); i += 1 }
        }
        emit(TStr(sb.toString))
      }
      else if (c == '0' && (peek(1) == 'd') && peek(2).isDigit) {
        // 0d1642262159 — epoch literal
        i += 2
        val s = i
        while (i < n && input.charAt(i).isDigit) i += 1
        val text = input.substring(s, i)
        try emit(TDatetime(text.toLong))
        catch { case _: NumberFormatException =>
          throw LexError(s"datetime literal out of range '0d$text' at $s") }
      }
      else if (c == '0' && peek(1) == 'b' && peek(2) == '\'') {
        i += 3
        val s = i
        while (i < n && input.charAt(i) != '\'') i += 1
        if (i >= n) throw LexError("unterminated 0b literal")
        val b64 = input.substring(s, i)
        i += 1
        emit(TBinary(b64))
      }
      else if (c == '0' && peek(1) == 'h' && peek(2) == '\'') {
        // 0h'9q8yyk' — geohash literal (reference README.md:139 "hash: a
        // special type of string"; encoder src/Type/Hash.cpp:18-90 —
        // NOTE the reference declares but never lexes it: src/gql.l has
        // no 0h rule). Validate against the geohash base-32 alphabet so
        // a typo'd hash fails at lex time, not at first spatial use.
        i += 3
        val s = i
        while (i < n && input.charAt(i) != '\'') i += 1
        if (i >= n) throw LexError("unterminated 0h literal")
        val h = input.substring(s, i)
        i += 1
        val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz" // Hash.cpp:18 charMap
        if (h.isEmpty || !h.forall(alphabet.contains(_)))
          throw LexError(s"bad geohash literal '0h'$h'' at $s")
        emit(THash(h))
      }
      else if (c.isDigit || (c == '.' && peek(1).isDigit) ||
               (c == '-' && !prevEndsValue && (peek(1).isDigit || peek(1) == '.') &&
                 !isArrowStart(input, i))) {
        val s = i
        if (c == '-') i += 1
        // at most one '.' — `1.2.3` must surface as a parse error with
        // position info, not a NumberFormatException from toDouble
        var seenDot = false
        var scanning = true
        while (i < n && scanning) {
          val ch = input.charAt(i)
          if (ch.isDigit) i += 1
          else if (ch == '.' && !seenDot) { seenDot = true; i += 1 }
          else scanning = false
        }
        // exponent form not used by the grammar; keep ints exact
        val text = input.substring(s, i)
        try {
          if (text.contains('.')) emit(TNum(text.toDouble))
          else emit(TInt(text.toLong))
        } catch { case _: NumberFormatException =>
          // overflow digit-run or lone '-'/'.' — a malformed literal must
          // surface as a LexError with position, not a NumberFormatException
          throw LexError(s"bad numeric literal '$text' at $s")
        }
      }
      else if (c == '-' && peek(1) == '>') { emit(TPunct("->")); i += 2 }
      else if (c == '<' && peek(1) == '-') { emit(TPunct("<-")); i += 2 }
      else if (c == '-' && peek(1) == '-') { emit(TPunct("--")); i += 2 }
      else if (c == '=' && peek(1) == '>') { emit(TPunct("=>")); i += 2 }
      else if ("{}[]():,;*".indexOf(c) >= 0) { emit(TPunct(c.toString)); i += 1 }
      else if ("+-/=".indexOf(c) >= 0) { emit(TPunct(c.toString)); i += 1 } // lambda ops
      else if (c == '$' || c == '_' || Character.isLetter(c)) {
        val s = i
        i += 1
        while (i < n && (input.charAt(i) == '_' || input.charAt(i) == '$' ||
          input.charAt(i) == '.' || Character.isLetterOrDigit(input.charAt(i)))) i += 1
        emit(TIdent(input.substring(s, i)))
      }
      else throw LexError(s"unexpected character '$c' at $i")
    }
    out += TEof
    out.result()
  }

  private def isArrowStart(s: String, i: Int): Boolean =
    i + 1 < s.length && (s.charAt(i + 1) == '>' || s.charAt(i + 1) == '-')
}
