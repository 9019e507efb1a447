package graft.sqlfront

/** The dialect's identifier validity + normalization rules
  * (`/root/reference/src/identifier.rs:4-87`): charset
  * `[a-zA-Z0-9_ ]` (space is reachable only through backtick quoting),
  * minimum length 1, no leading digit or space; canonical form is
  * ASCII-lowercased. Bare words already satisfy the charset by the
  * lexer's own rules; backtick-quoted identifiers arrive as raw
  * content and are validated here. */
object Identifiers {

  private def okChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
    (c >= '0' && c <= '9') || c == '_' || c == ' '

  /** `Some(normalized)` iff `value` is a valid identifier — the exact
    * acceptance set of the reference's `Identifier::new`
    * (`identifier.rs:58-87`, test vectors `identifier.rs:89-111`). */
  def normalize(value: String): Option[String] =
    if (value.isEmpty) None
    else if ((value.head >= '0' && value.head <= '9') ||
             value.head == ' ') None
    else if (!value.forall(okChar)) None
    else Some(value.map(c =>
      if (c >= 'A' && c <= 'Z') (c + 32).toChar else c))
}
