package graft.syntax

/** Clause-level decomposition of a single SELECT statement (no leading WITH).
  *
  * The reference extracts the same structure through a C++ FFI bridge to
  * DuckDB's parser (yardstick_parser_ffi.cpp) with a string fallback
  * (measures.rs:7168-7197). We only need clause *spans* — the clean SQL
  * inside each clause is handed to Spark's parser unchanged — so a
  * mask-aware scan is sufficient and keeps this module Spark-free.
  */
final case class SelectClauses(
    sql: String,
    distinct: Boolean,
    selectList: String,          // text between SELECT [DISTINCT] and FROM
    selectItems: List[String],   // top-level comma split of selectList
    from: Option[String],
    where: Option[String],
    groupBy: Option[String],
    having: Option[String],
    qualify: Option[String],
    orderBy: Option[String],
    limitText: Option[String],   // trailing "LIMIT n [OFFSET k]" text, if any
    hasSetOp: Boolean
)

object SqlClauses {

  /** Known clause starters after the select list, in order. */
  private val stops: List[Seq[String]] = List(
    Seq("FROM"), Seq("WHERE"), Seq("GROUP", "BY"), Seq("HAVING"),
    Seq("QUALIFY"), Seq("ORDER", "BY"), Seq("LIMIT"))

  def parse(sqlRaw: String): Option[SelectClauses] = {
    val sql = sqlRaw
    val mask = Scan.buildMask(sql)
    val n = sql.length
    val selPos = Scan.findTopLevelWord(sql, mask, "SELECT", 0, n)
    if (selPos < 0) return None
    // reject if anything substantive precedes SELECT (e.g. INSERT, CREATE)
    val prefix = sql.substring(0, selPos)
    if (prefix.exists(c => !c.isWhitespace) &&
        !prefix.trim.equalsIgnoreCase("")) return None

    val hasSetOp = setOpSpans(sql, mask).exists(_._1 >= selPos)

    var cursor = selPos + "SELECT".length
    // optional DISTINCT
    var distinct = false
    val distPos = {
      var i = cursor
      while (i < n && (sql.charAt(i).isWhitespace || mask(i))) i += 1
      i
    }
    if (distPos + 8 <= n && sql.regionMatches(true, distPos, "DISTINCT", 0, 8) &&
        (distPos + 8 >= n || !Scan.isIdentChar(sql.charAt(distPos + 8)))) {
      distinct = true
      cursor = distPos + 8
    }

    // locate each clause start
    def findStop(words: Seq[String], from: Int): Int = {
      val r = Scan.findTopLevelSeq(sql, mask, words, from, n)
      if (r == null) -1 else r._1
    }
    val positions: List[(Seq[String], Int)] =
      stops.map(w => (w, findStop(w, cursor))).filter(_._2 >= 0).sortBy(_._2)

    def clauseText(kw: Seq[String]): Option[String] = {
      val idx = positions.indexWhere(_._1 == kw)
      if (idx < 0) None
      else {
        val (_, start) = positions(idx)
        val seqEnd = Scan.findTopLevelSeq(sql, mask, kw, start, n)._2
        val end = if (idx + 1 < positions.length) positions(idx + 1)._2 else n
        Some(sql.substring(seqEnd, end).trim).filter(_.nonEmpty)
      }
    }

    val selectEnd = if (positions.nonEmpty) positions.head._2 else n
    val selectList = sql.substring(cursor, selectEnd).trim
    val items = Scan.splitTopLevel(sql, mask, ',', cursor, selectEnd)
      .map { case (s, e) => sql.substring(s, e).trim }.filter(_.nonEmpty)

    val limitIdx = positions.indexWhere(_._1 == Seq("LIMIT"))
    val limitText =
      if (limitIdx < 0) None
      else Some(sql.substring(positions(limitIdx)._2, n).trim)

    Some(SelectClauses(
      sql = sql,
      distinct = distinct,
      selectList = selectList,
      selectItems = items,
      from = clauseText(Seq("FROM")),
      where = clauseText(Seq("WHERE")),
      groupBy = clauseText(Seq("GROUP", "BY")),
      having = clauseText(Seq("HAVING")),
      qualify = clauseText(Seq("QUALIFY")),
      orderBy = clauseText(Seq("ORDER", "BY")),
      limitText = limitText,
      hasSetOp = hasSetOp
    ))
  }

  /** Split a statement at its top-level set operators. Returns (opText,
    * branchSql) pairs — opText is "" for the first branch, else the
    * operator with its optional ALL/DISTINCT modifier (original casing).
    * Nil when no top-level set operator exists. A whole-statement trailing
    * ORDER BY / LIMIT stays attached to the last branch (callers that
    * reassemble branches in place preserve it).
    */
  def splitSetOpBranches(stmt: String): List[(String, String)] = {
    val mask = Scan.buildMask(stmt)
    val sorted = setOpSpans(stmt, mask)
    if (sorted.isEmpty) return Nil
    val starts = 0 :: sorted.map(_._2)
    val ends = sorted.map(_._1) :+ stmt.length
    val texts = "" :: sorted.map(_._3)
    texts.lazyZip(starts).lazyZip(ends).map { (t, s, e) =>
      (t, stmt.substring(s, e).trim)
    }.toList
  }

  /** Top-level set operators of a statement as (start, end, text) spans in
    * text order; `end` extends over an ALL/DISTINCT modifier. Spark's
    * select-list exclusion syntax — `SELECT * EXCEPT (col, …)` — is NOT a
    * set operator: an EXCEPT with no modifier whose next token is a
    * parenthesized group that does not itself start a query (SELECT / WITH /
    * VALUES / TABLE / FROM after any nested opening parens) is skipped
    * (r11 ADVICE: splitting there turned a valid measure view using
    * `* EXCEPT(c)` into a '('-leading pseudo-branch).
    */
  def setOpSpans(stmt: String, mask: Array[Boolean]): List[(Int, Int, String)] = {
    val ops = scala.collection.mutable.ListBuffer[(Int, Int, String)]()
    for (kw <- Seq("UNION", "INTERSECT", "EXCEPT")) {
      var from = 0
      var p = Scan.findTopLevelWord(stmt, mask, kw, from, stmt.length)
      while (p >= 0) {
        var e = p + kw.length
        var j = e
        while (j < stmt.length && stmt.charAt(j).isWhitespace) j += 1
        var hasMod = false
        for (mod <- Seq("ALL", "DISTINCT"))
          if (stmt.regionMatches(true, j, mod, 0, mod.length) &&
              (j + mod.length >= stmt.length || !Scan.isIdentChar(stmt.charAt(j + mod.length)))) {
            e = j + mod.length
            hasMod = true
          }
        val selectListForm = kw == "EXCEPT" && !hasMod && isColumnListParen(stmt, mask, e)
        if (!selectListForm) ops += ((p, e, stmt.substring(p, e)))
        from = e
        p = Scan.findTopLevelWord(stmt, mask, kw, from, stmt.length)
      }
    }
    ops.sortBy(_._1).toList
  }

  /** True when position `from` (after whitespace) opens a parenthesized
    * group whose content is a column list rather than a query — the next
    * keyword through any nested opening parens is not a query starter.
    */
  private def isColumnListParen(stmt: String, mask: Array[Boolean], from: Int): Boolean = {
    // mask-covered positions (comments, strings, quoted identifiers) are
    // skipped at BOTH hops — `EXCEPT (/* note */ SELECT …)` is a genuine
    // set operation whose starter hides behind a comment, and
    // `* EXCEPT /* c */ (col)` is still the select-list form (r12 ADVICE)
    var j = from
    while (j < stmt.length && (mask(j) || stmt.charAt(j).isWhitespace)) j += 1
    if (j >= stmt.length || stmt.charAt(j) != '(') return false
    var k = j + 1
    while (k < stmt.length &&
           (mask(k) || stmt.charAt(k).isWhitespace || stmt.charAt(k) == '(')) k += 1
    val starters = Seq("SELECT", "WITH", "VALUES", "TABLE", "FROM")
    !starters.exists(w => stmt.regionMatches(true, k, w, 0, w.length) &&
      (k + w.length >= stmt.length || !Scan.isIdentChar(stmt.charAt(k + w.length))))
  }

  /** Split "a AS b" / "a b" select item into (expr, aliasOpt).
    * Only a trailing bare-identifier alias is recognized.
    */
  def splitAlias(item: String): (String, Option[String]) = {
    val mask = Scan.buildMask(item)
    // find last top-level " AS " (word)
    var asPos = -1
    var search = 0
    while (search < item.length) {
      val p = Scan.findTopLevelWord(item, mask, "AS", search, item.length)
      if (p < 0) search = item.length
      else { asPos = p; search = p + 2 }
    }
    if (asPos > 0) {
      val alias = item.substring(asPos + 2).trim
      if (alias.nonEmpty && alias.forall(Scan.isIdentChar) &&
          (alias.head.isLetter || alias.head == '_'))
        return (item.substring(0, asPos).trim, Some(alias))
      // quoted alias "x" or `x`
      if (alias.length > 1 &&
          ((alias.head == '"' && alias.last == '"') ||
           (alias.head == '`' && alias.last == '`')))
        return (item.substring(0, asPos).trim, Some(alias.substring(1, alias.length - 1)))
    }
    // bare trailing identifier alias: "<expr> alias" — only recognize when
    // expr would otherwise end with ')' or an identifier char and the last
    // token is a lone identifier separated by whitespace and the item is not
    // itself a single identifier
    val ids = Scan.identifiers(item, mask, 0, item.length)
    if (ids.nonEmpty) {
      val (tok, s, e) = ids.last
      if (e == item.length && s > 0 && item.charAt(s - 1).isWhitespace && !tok.contains('.')) {
        val exprPart = item.substring(0, s).trim
        if (exprPart.nonEmpty && !exprPart.equalsIgnoreCase("distinct") &&
            (exprPart.last == ')' || exprPart.last == '\'' || exprPart.last == '"')) {
          if (!reservedTail.contains(tok.toLowerCase))
            return (exprPart, Some(tok))
        }
      }
    }
    (item.trim, None)
  }

  private val reservedTail = Set("asc", "desc", "first", "last", "nulls")

  /** Column name a select item would get with no alias: plain (possibly
    * qualified) column ref -> last part; otherwise None.
    */
  def plainColumnName(expr: String): Option[String] = {
    val t = expr.trim
    val mask = Scan.buildMask(t)
    Scan.identifiers(t, mask, 0, t.length) match {
      case (tok, s, e) :: Nil if s == 0 && e == t.length => Some(Scan.lastPart(tok))
      case _ => None
    }
  }

  /** True when the expression is a bare literal constant (number, string,
    * TRUE/FALSE/NULL, or interval/typed literal). Reference:
    * is_literal_constant, measures.rs:7733-7786.
    */
  def isLiteral(expr: String): Boolean = {
    val t = expr.trim
    if (t.isEmpty) return false
    if (t.matches("(?i)[-+]?\\d+(\\.\\d+)?([eE][-+]?\\d+)?")) return true
    if (t.matches("(?i)(true|false|null)")) return true
    val mask = Scan.buildMask(t)
    // fully-masked = a single string literal
    if (mask.forall(identity)) return true
    if (t.matches("(?is)(date|timestamp|interval)\\s+'.*'")) return true
    false
  }
}
