package graft.util

/** SQL identifier / string quoting helpers for DDL synthesis
  * (behavioral spec: /root/reference/pkg/util/stringbuffer.go:46-58). */
object Sql {
  private val plainIdent = "^[a-zA-Z]\\w*$".r

  /** Quote iff required: bare `^[a-zA-Z]\w*$` identifiers pass through,
    * everything else gets "double quotes" with `""` escaping. */
  def ident(s: String): String =
    if (plainIdent.matches(s)) s
    else "\"" + s.replace("\"", "\"\"") + "\""

  /** Single-quoted SQL string literal with `''` escaping. */
  def string(s: String): String =
    "'" + s.replace("'", "''") + "'"
}
