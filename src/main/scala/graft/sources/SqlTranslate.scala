package graft.sources

/** Minimal Postgres→Spark SQL compatibility shim for the constructs that
  * appear in the reference's floorplans (SURVEY.md §7.4 risk #2). Floorist
  * ships SQL to Postgres opaquely; since our engine executes the SQL itself,
  * the Postgres-isms in the reference corpus need a rewrite:
  *
  *  - `uuid_generate_v1()` (`tests/floorplan_valid.yaml:1`) → `uuid()`;
  *  - `GENERATE_SERIES(a,b)` as a FROM-item with alias `x` — in Postgres the
  *    column is named after the alias (`tests/floorplan_with_large_result
  *    .yaml:1`) → a subquery `(SELECT explode(sequence(a,b)) AS x) AS x`;
  *  - bare `SELECT GENERATE_SERIES(a,b)` (`tests/floorplan_with_custom_
  *    chunksize.yaml:1`) → `SELECT explode(sequence(a,b)) AS generate_series`;
  *  - zero-column `SELECT WHERE 1=0` (`tests/floorplan_with_empty_dataset
  *    .yaml:1`) → `SELECT NULL AS empty WHERE 1=0` (Spark requires ≥1 column);
  *  - double-quoted identifiers (`README.md:127`) → backticks.
  *
  * This is a deliberate shim over the known corpus, not a SQL transpiler —
  * full floorplans written for our engine use Spark SQL directly.
  */
object SqlTranslate {

  /** SQL keywords that must not be eaten as a bare (AS-less) alias: in
    * `FROM GENERATE_SERIES(1,9) WHERE ...` the next word is a clause, not
    * an alias, and consuming it would corrupt the statement. */
  private val NonAliasKeywords =
    "WHERE|GROUP|ORDER|LIMIT|OFFSET|HAVING|UNION|EXCEPT|INTERSECT|" +
      "JOIN|INNER|LEFT|RIGHT|FULL|CROSS|NATURAL|ON|USING|" +
      "FETCH|WINDOW|FOR|QUALIFY"
  private val FromSeries =
    raw"(?i)\b(FROM|JOIN)\s+GENERATE_SERIES\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)(?:\s+(?:AS\s+)?(?!(?:$NonAliasKeywords)\b)(\w+))?".r
  private val AliasedSeries =
    raw"(?i)GENERATE_SERIES\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)\s+AS\s+(\w+)".r
  private val BareSeries =
    raw"(?i)GENERATE_SERIES\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)".r
  private val EmptySelect =
    raw"(?i)^\s*SELECT\s+WHERE\b".r
  private val QuotedIdent =
    "\"([A-Za-z_][A-Za-z0-9_]*)\"".r

  def translate(sql: String): String = {
    var out = sql
    out = FromSeries.replaceAllIn(out, m => {
      // Unaliased FROM-item keeps Postgres's default name for both the
      // relation and its column: `generate_series`.
      val alias = Option(m.group(4)).getOrElse("generate_series")
      s"${m.group(1)} (SELECT explode(sequence(${m.group(2)}, ${m.group(3)})) AS $alias) AS $alias"
    })
    // An explicitly aliased series keeps its alias; only a truly bare one
    // gains the Postgres default column name.
    out = AliasedSeries.replaceAllIn(out, m =>
      s"explode(sequence(${m.group(1)}, ${m.group(2)})) AS ${m.group(3)}")
    out = BareSeries.replaceAllIn(out, m =>
      s"explode(sequence(${m.group(1)}, ${m.group(2)})) AS generate_series")
    out = EmptySelect.replaceFirstIn(out, "SELECT NULL AS empty WHERE")
    out = out.replace("uuid_generate_v1()", "uuid()")
    out = backtickQuotedIdents(out)
    // Spark refuses non-foldable expressions (uuid()) inside inline tables
    // (INVALID_INLINE_TABLE); Postgres allows them, and the reference's
    // canonical fixture relies on it. Rewrite such VALUES to a UNION ALL.
    if (out.contains("uuid()")) out = rewriteNonFoldableValues(out)
    out
  }

  /** Converts double-quoted identifiers to backticks, skipping anything
    * inside single-quoted string literals (a naive regex would corrupt
    * literal data like `'he said "ok"'`). */
  private[sources] def backtickQuotedIdents(sql: String): String = {
    val sb = new StringBuilder(sql.length)
    var i = 0
    var inStr = false
    while (i < sql.length) {
      val c = sql(i)
      if (inStr) {
        sb += c
        if (c == '\'') inStr = false
        i += 1
      } else if (c == '\'') {
        sb += c; inStr = true; i += 1
      } else if (c == '"') {
        QuotedIdent.findPrefixMatchOf(sql.substring(i)) match {
          case Some(m) => sb ++= s"`${m.group(1)}`"; i += m.end
          case None    => sb += c; i += 1
        }
      } else { sb += c; i += 1 }
    }
    sb.result()
  }

  /** Rewrites `[(]VALUES (a,b), (c,d)[)] AS t(x, y)` into
    * `(SELECT a AS x, b AS y UNION ALL SELECT c, d) AS t` when the tuples
    * contain a non-foldable function call. Tuples are scanned with balanced
    * parens and quote awareness (function calls inside tuples are fine). */
  private[sources] def rewriteNonFoldableValues(sql: String): String = {
    val kw = raw"(?i)\bVALUES\b".r.findFirstMatchIn(sql).getOrElse(return sql)
    // Include a directly-wrapping '(' if present: `FROM (VALUES ...) AS t(..)`.
    var start = kw.start
    var wrapped = false
    var i = start - 1
    while (i >= 0 && sql(i).isWhitespace) i -= 1
    if (i >= 0 && sql(i) == '(') { start = i; wrapped = true }

    // Scan the tuples after VALUES.
    var pos = kw.end
    val tuples = scala.collection.mutable.Buffer[String]()
    var more = true
    while (more) {
      while (pos < sql.length && sql(pos).isWhitespace) pos += 1
      if (pos >= sql.length || sql(pos) != '(') return sql // not an inline table
      var depth = 0; var inStr = false
      val from = pos + 1
      var end = -1
      var j = pos
      while (j < sql.length && end < 0) {
        val c = sql(j)
        if (inStr) { if (c == '\'') inStr = false }
        else c match {
          case '\'' => inStr = true
          case '('  => depth += 1
          case ')'  => depth -= 1; if (depth == 0) end = j
          case _    =>
        }
        j += 1
      }
      if (end < 0) return sql
      tuples += sql.substring(from, end)
      pos = end + 1
      while (pos < sql.length && sql(pos).isWhitespace) pos += 1
      if (pos < sql.length && sql(pos) == ',') pos += 1 else more = false
    }
    if (wrapped) {
      while (pos < sql.length && sql(pos).isWhitespace) pos += 1
      if (pos >= sql.length || sql(pos) != ')') return sql
      pos += 1
    }
    val aliasRe = raw"(?is)^\s*AS\s+(\w+)\s*\(([^)]*)\)".r
    val rest = sql.substring(pos)
    val m = aliasRe.findFirstMatchIn(rest).getOrElse(return sql)
    val name = m.group(1)
    val cols = m.group(2).split(",").map(_.trim)

    def splitTop(t: String): Seq[String] = {
      val parts = scala.collection.mutable.Buffer[String]()
      var depth = 0; var inStr = false; val cur = new StringBuilder
      t.foreach { c =>
        if (inStr) { cur += c; if (c == '\'') inStr = false }
        else c match {
          case '\'' => inStr = true; cur += c
          case '('  => depth += 1; cur += c
          case ')'  => depth -= 1; cur += c
          case ',' if depth == 0 => parts += cur.result().trim; cur.clear()
          case _ => cur += c
        }
      }
      parts += cur.result().trim
      parts.toSeq
    }

    val selects = tuples.zipWithIndex.map { case (t, idx) =>
      val exprs = splitTop(t)
      if (exprs.size != cols.length) return sql
      val projected =
        if (idx == 0) exprs.zip(cols).map { case (e, c) => s"$e AS $c" }
        else exprs
      s"SELECT ${projected.mkString(", ")}"
    }
    sql.substring(0, start) +
      s"(${selects.mkString(" UNION ALL ")}) AS $name" +
      rest.substring(m.end)
  }
}
