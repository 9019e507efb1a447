package graft.sqlfront

/** Tokenizer for the llamadb SQL dialect. Covers the reference lexer's
  * observable surface (`src/sqlsyntax/lexer.rs`): keywords, `identifiers`
  * (incl. backtick-quoted), 'string' literals with backslash escapes,
  * numbers, `--` and `/* */` comments, and one/two-char operators
  * (`<=`, `>=`, `<>`, `!=`, `||`). Identifiers normalize to lowercase
  * (reference `src/identifier.rs`).
  */
object Lexer {

  sealed trait Token
  case class Kw(word: String)     extends Token // uppercase keyword
  case class Id(name: String)     extends Token // lowercased identifier
  case class Str(value: String)   extends Token
  case class Num(text: String)    extends Token
  case class Op(sym: String)      extends Token
  case object EOF                 extends Token

  private val keywords = Set(
    "select", "from", "where", "group", "by", "having", "order", "limit",
    "asc", "desc", "join", "inner", "left", "outer", "on", "as",
    "create", "table", "insert", "into", "values", "explain", "null",
    "and", "or", "not", "distinct", "update", "set", "delete")

  case class LexError(msg: String) extends RuntimeException(msg)

  def tokenize(input: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    val n = input.length
    def peek(k: Int = 0): Char = if (i + k < n) input.charAt(i + k) else '\u0000'
    while (i < n) {
      val c = input.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && peek(1) == '-') { // line comment
        while (i < n && input.charAt(i) != '\n') i += 1
      } else if (c == '/' && peek(1) == '*') { // block comment
        i += 2
        while (i + 1 < n && !(input.charAt(i) == '*' && peek(1) == '/')) i += 1
        i += 2
      } else if (c == '\'') { // string literal, backslash escapes
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          val ch = input.charAt(i)
          if (ch == '\\' && i + 1 < n) { sb.append(input.charAt(i + 1)); i += 2 }
          else if (ch == '\'') { closed = true; i += 1 }
          else { sb.append(ch); i += 1 }
        }
        if (!closed) throw LexError("unterminated string literal")
        out += Str(sb.toString)
      } else if (c == '`') { // backtick identifier
        val j = input.indexOf('`', i + 1)
        if (j < 0) throw LexError("unterminated backtick identifier")
        val raw = input.substring(i + 1, j)
        // validity rules from the reference (identifier.rs:58-87):
        // charset [a-zA-Z0-9_ ], nonempty, no leading digit/space —
        // with the reference's compile-stage error surface
        // ("bad identifier: x", queryplan/mod.rs:44,76)
        out += Id(Identifiers.normalize(raw).getOrElse(
          throw LexError(s"bad identifier: $raw")))
        i = j + 1
      } else if ((c >= '0' && c <= '9') ||
                 (c == '.' && peek(1) >= '0' && peek(1) <= '9')) {
        // number — ASCII digits only, like the reference lexer's
        // '0'...'9' arm (sqlsyntax/lexer.rs); a Unicode digit (e.g.
        // Arabic-Indic ٥) falls through to the unknown-character error
        // exactly as it does there, matching the word arm's discipline
        def asciiDigit(ch: Char) = ch >= '0' && ch <= '9'
        val start = i
        while (i < n && (asciiDigit(input.charAt(i)) ||
                         input.charAt(i) == '.')) i += 1
        out += Num(input.substring(start, i))
      } else if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
                 c == '_') { // word — ASCII only, like the reference
        // lexer's 'a'...'z' | 'A'...'Z' | '_' word-start arm
        // (sqlsyntax/lexer.rs:159); a non-ASCII letter falls through to
        // the unknown-character error exactly as it does there
        def wordChar(ch: Char) =
          (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z') ||
          (ch >= '0' && ch <= '9') || ch == '_'
        val start = i
        while (i < n && wordChar(input.charAt(i))) i += 1
        val w = input.substring(start, i).toLowerCase
        out += (if (keywords(w)) Kw(w.toUpperCase) else Id(w))
      } else {
        val two = if (i + 1 < n) input.substring(i, i + 2) else ""
        two match {
          case "<=" | ">=" | "<>" | "!=" | "||" =>
            out += Op(if (two == "!=") "<>" else two); i += 2
          case _ =>
            c match {
              case '=' | '<' | '>' | '+' | '-' | '*' | '/' | '(' | ')' |
                   ',' | ';' | '.' | '&' | '|' | '[' | ']' =>
                out += Op(c.toString); i += 1
              // `?` is a lexer token in the reference
              // (src/sqlsyntax/lexer.rs:39) with no parse or execute
              // path there either — lex it so scripts containing it
              // fail in the parser with a clear message, not a lex error
              case '?' =>
                out += Op("?"); i += 1
              case other => throw LexError(s"unexpected character '$other'")
            }
        }
      }
    }
    out += EOF
    out.result()
  }
}
