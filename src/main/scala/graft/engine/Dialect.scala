package graft.engine

/** exosql SQL-dialect shim (SURVEY.md §3, §7.3): the reference's parser
  * accepts `$var` placeholders and PostgreSQL-style `DISTINCT ON`
  * (`lib/parser.ex`, `src/sql_parser.yrl` [U]). Rather than forking
  * Spark's parser, both are handled as source-to-source rewrites before
  * `spark.sql` — `$var` becomes a Spark named parameter (`:var`), and
  * `DISTINCT ON (keys)` becomes a row_number window.
  */
object Dialect {

  /** Rewrite `$name` → `:name` (Spark named-parameter marker), skipping
    * string literals and quoted identifiers. */
  def rewriteVars(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    var inStr = false; var inQuote = false; var inBacktick = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) { out += c; if (c == '\'') inStr = false; i += 1 }
      else if (inQuote) { out += c; if (c == '"') inQuote = false; i += 1 }
      else if (inBacktick) { out += c; if (c == '`') inBacktick = false; i += 1 }
      else c match {
        case '\'' => inStr = true; out += c; i += 1
        case '"' => inQuote = true; out += c; i += 1
        case '`' => inBacktick = true; out += c; i += 1
        case '$' if i + 1 < sql.length &&
            (sql.charAt(i + 1).isLetter || sql.charAt(i + 1) == '_') =>
          out += ':'; i += 1
        case _ => out += c; i += 1
      }
    }
    out.toString
  }

  /** Find the matching close paren for the open paren at `start`. */
  private def matchParen(s: String, start: Int): Int = {
    var depth = 0
    var i = start
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  private def isIdentChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** Index of a top-level keyword: paren-depth 0, outside single/double
    * quotes and backtick identifiers, not inside an identifier
    * (underscores count as identifier chars — `valid_from` is not FROM). */
  private def topLevelIndex(s: String, kw: String): Int = {
    val upper = s.toUpperCase
    var depth = 0; var inStr = false; var inDq = false; var inBt = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (inDq) { if (c == '"') inDq = false }
      else if (inBt) { if (c == '`') inBt = false }
      else c match {
        case '\'' => inStr = true
        case '"' => inDq = true
        case '`' => inBt = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && upper.startsWith(kw, i) &&
              (i == 0 || !isIdentChar(s.charAt(i - 1))) &&
              (i + kw.length >= s.length || !isIdentChar(s.charAt(i + kw.length))))
            return i
      }
      i += 1
    }
    -1
  }

  private val DistinctOn = """(?is)^\s*SELECT\s+DISTINCT\s+ON\s*\(""".r

  /** Rewrite `SELECT DISTINCT ON (k1, k2) list FROM tail [ORDER BY o]
    * [LIMIT n [OFFSET m]]` into a row_number window over (k1, k2)
    * ordered by `o` (or the keys when absent), keeping the first row per
    * key group; LIMIT/OFFSET apply after dedup and output ordering
    * follows the ORDER BY, like PostgreSQL/exosql.
    *
    * Limitation: only a TOP-LEVEL `SELECT DISTINCT ON` is rewritten
    * (matching the reference's usage); a DISTINCT ON inside a subquery
    * or CTE is not — use the window form directly there. */
  def rewriteDistinctOn(sql: String): String = DistinctOn.findFirstMatchIn(sql) match {
    case None => sql
    case Some(m) =>
      val openIdx = m.end - 1
      val closeIdx = matchParen(sql, openIdx)
      require(closeIdx > 0, s"unbalanced DISTINCT ON parens in: $sql")
      val keys = sql.substring(openIdx + 1, closeIdx).trim
      val rest = sql.substring(closeIdx + 1) // "<select list> FROM <tail>"
      // LIMIT/OFFSET apply AFTER dedup (PostgreSQL) — peel them off the
      // tail so they end up on the outer query, not inside the window
      def splitTrailing(s: String): (String, String) = {
        val idxs = Seq("LIMIT", "OFFSET").map(topLevelIndex(s, _)).filter(_ >= 0)
        if (idxs.isEmpty) (s, "")
        else {
          val i = idxs.min
          (s.substring(0, i), " " + s.substring(i).trim)
        }
      }
      val orderIdx = topLevelIndex(rest, "ORDER BY")
      val (body, orderBy, trailing) =
        if (orderIdx >= 0) {
          val (ob, tr) = splitTrailing(
            rest.substring(orderIdx + "ORDER BY".length))
          (rest.substring(0, orderIdx), ob.trim, tr)
        } else {
          val (b, tr) = splitTrailing(rest)
          (b, "", tr)
        }
      val fromIdx = topLevelIndex(body, "FROM")
      require(fromIdx >= 0, s"DISTINCT ON without FROM in: $sql")
      val selectList = body.substring(0, fromIdx).trim
      val fromTail = body.substring(fromIdx)
      val windowOrder = if (orderBy.nonEmpty) orderBy else keys
      val outer =
        (if (orderBy.nonEmpty) s" ORDER BY $orderBy" else "") + trailing
      // inner keeps ALL source columns so the outer select list AND the
      // outer ORDER BY may reference columns not in the projection
      // (PostgreSQL DISTINCT ON allows both)
      val outerList =
        if (selectList == "*") "* EXCEPT (__graft_rn)" else selectList
      s"""SELECT $outerList FROM (
         |  SELECT *, row_number() OVER (PARTITION BY $keys ORDER BY $windowOrder) AS __graft_rn
         |  $fromTail
         |) WHERE __graft_rn = 1$outer""".stripMargin
  }

  def rewrite(sql: String): String = rewriteDistinctOn(rewriteVars(sql))
}
