package graft.syntax

import graft.catalog.{MeasureKind, ViewMeasure}

/** Parsed `CREATE VIEW ... AS SELECT ... <expr> AS MEASURE <name> ... FROM ...`.
  *
  * Reference behavior: process_create_view / extract_measures_from_sql,
  * /root/reference/yardstick-rs/src/sql/measures.rs:4401-4573. We parse the
  * statement into clause spans (instead of the reference's backward
  * expression scan over raw bytes) and classify each measure.
  */
final case class ParsedMeasureView(
    viewName: String,
    orReplace: Boolean,
    temporary: Boolean,
    clauses: SelectClauses,
    // select items in order: Left(dimText) | Right(measure)
    items: Seq[Either[String, ViewMeasure]],
    baseRelationSql: String,
    dimensionExprs: Map[String, String],
    dimensionOrder: Seq[String],
    groupByCols: Seq[String],
    // leading `WITH ctes` prefix of the view body ("" when none) — prepended
    // to both the clean view and the base relation
    ctePrefix: String = ""
) {
  def measures: Seq[ViewMeasure] = items.collect { case Right(m) => m }
}

object MeasureDdl {

  private val createRe =
    """(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?(TEMP\s+|TEMPORARY\s+)?VIEW\s+(IF\s+NOT\s+EXISTS\s+)?([A-Za-z_][\w.]*|"[^"]+"|`[^`]+`)\s+AS\s+(.*)$""".r

  /** Quick containment check (mask-aware). Reference: yardstick_has_as_measure,
    * measures.rs:200-205.
    */
  def hasAsMeasure(sql: String): Boolean = {
    val mask = Scan.buildMask(sql)
    Scan.findTopLevelSeq(sql, mask, Seq("AS", "MEASURE"), 0, sql.length) != null ||
    hasNestedAsMeasure(sql, mask)
  }
  // AS MEASURE may sit at paren depth > 0 (e.g. CREATE VIEW v AS (SELECT ...))
  private def hasNestedAsMeasure(sql: String, mask: Array[Boolean]): Boolean = {
    val re = "(?i)\\bAS\\s+MEASURE\\b".r
    re.findAllMatchIn(sql).exists(m => !mask(m.start))
  }

  /** Aggregate function names recognized for classification. Spark + DuckDB
    * spellings (the engine shims DuckDB names at query time).
    */
  val aggregateFns: Set[String] = Set(
    "sum", "count", "avg", "mean", "min", "max", "product",
    "stddev", "stddev_pop", "stddev_samp", "std",
    "variance", "var_pop", "var_samp",
    "median", "mode", "percentile", "percentile_cont", "percentile_disc",
    "percentile_approx", "approx_percentile", "approx_count_distinct",
    "quantile", "quantile_cont", "quantile_disc",
    "string_agg", "array_agg", "listagg", "list", "collect_list", "collect_set",
    "first", "last", "first_value", "last_value", "any_value", "arbitrary",
    "bool_and", "bool_or", "every", "some",
    "corr", "covar_pop", "covar_samp", "skewness", "kurtosis",
    "count_if", "sum_distinct", "bit_and", "bit_or", "bit_xor",
    "min_by", "max_by", "arg_min", "arg_max",
    "regr_avgx", "regr_avgy", "regr_count", "regr_slope", "regr_intercept",
    "regr_r2", "regr_sxx", "regr_syy", "regr_sxy",
    "histogram", "entropy", "favg", "fsum"
  )

  /** Non-decomposable aggregate names (recomputed from base rows; the clean
    * view keeps them materialized). Reference: NON_DECOMPOSABLE_AGGREGATES,
    * measures.rs:3129-3150.
    */
  val nonDecomposableFns: Set[String] = Set(
    "median", "mode", "percentile", "percentile_cont", "percentile_disc",
    "percentile_approx", "approx_percentile",
    "quantile", "quantile_cont", "quantile_disc", "approx_count_distinct"
  )

  /** Find function-call names appearing in expr (unmasked, followed by '('). */
  private def callNames(expr: String): List[String] = {
    val mask = Scan.buildMask(expr)
    Scan.identifiers(expr, mask, 0, expr.length).flatMap { case (tok, _, e) =>
      var j = e
      while (j < expr.length && expr.charAt(j).isWhitespace) j += 1
      if (j < expr.length && expr.charAt(j) == '(') Some(Scan.lastPart(tok).toLowerCase)
      else None
    }
  }

  private def hasTopLevelOver(expr: String): Boolean = {
    val mask = Scan.buildMask(expr)
    Scan.findTopLevelWord(expr, mask, "OVER", 0, expr.length) >= 0
  }

  private def hasDistinctInsideCall(expr: String): Boolean = {
    val mask = Scan.buildMask(expr)
    val p = expr.toLowerCase
    val re = "\\(\\s*distinct\\b".r
    re.findAllMatchIn(p).exists(m => !mask(m.start))
  }

  def classify(expr: String, siblingMeasuresLower: Set[String]): MeasureKind = {
    if (hasTopLevelOver(expr)) return MeasureKind.Window
    val calls = callNames(expr)
    val refsSibling = {
      val mask = Scan.buildMask(expr)
      Scan.identifiers(expr, mask, 0, expr.length).exists { case (tok, _, e) =>
        var j = e
        while (j < expr.length && expr.charAt(j).isWhitespace) j += 1
        val isCall = j < expr.length && expr.charAt(j) == '('
        !isCall && siblingMeasuresLower.contains(Scan.lastPart(tok).toLowerCase)
      }
    }
    if (refsSibling && !calls.exists(aggregateFns.contains)) MeasureKind.Derived
    else if (calls.exists(nonDecomposableFns.contains) || hasDistinctInsideCall(expr))
      MeasureKind.NonDecomposable
    else MeasureKind.Decomposable
  }

  /** Parse a CREATE VIEW statement carrying AS MEASURE items. Returns None
    * when the statement is not such a view.
    */
  def parse(sqlRaw: String): Option[ParsedMeasureView] = {
    val sql = sqlRaw.trim.stripSuffix(";")
    if (!hasAsMeasure(sql)) return None
    sql match {
      case createRe(orRepl, temp, _, rawName, body0) =>
        val viewName = rawName.stripPrefix("\"").stripSuffix("\"")
          .stripPrefix("`").stripSuffix("`")
        // body may be parenthesized
        var body = body0.trim
        if (body.startsWith("(") ) {
          val m = Scan.buildMask(body)
          val close = Scan.matchParen(body, m, 0)
          if (close == body.length - 1) body = body.substring(1, close).trim
        }
        // a leading CTE list stays attached to both the clean view and the
        // base relation (reference: CTE-bodied measure views)
        val (ctePrefix, mainBody) = splitWithPrefix(body)
        body = mainBody
        val clauses = SqlClauses.parse(body).getOrElse(return None)

        // collect measure names first (two-pass, for derived classification)
        val rawItems = clauses.selectItems.map(parseMeasureItem)
        val measureNames = rawItems.collect { case Some((_, name)) => name.toLowerCase }.toSet
        if (measureNames.isEmpty) return None

        val items: Seq[Either[String, ViewMeasure]] =
          clauses.selectItems.zip(rawItems).map {
            case (_, Some((expr, name))) =>
              Right(ViewMeasure(name, expr.trim, classify(expr, measureNames - name.toLowerCase)))
            case (item, None) => Left(item)
          }

        // base relation: SELECT * FROM <from> [WHERE <where>]
        // set-op bodies get wrapped whole (measures.rs:2645-2650)
        val pfx = if (ctePrefix.isEmpty) "" else ctePrefix + " "
        val baseRelationSql =
          if (clauses.hasSetOp) s"${pfx}SELECT * FROM ( $body ) __setop"
          else {
            val f = clauses.from.getOrElse(return None)
            val w = clauses.where.map(w => s" WHERE $w").getOrElse("")
            s"${pfx}SELECT * FROM $f$w"
          }

        // dimension exprs: every non-measure select item alias -> expr
        val dimPairs = items.collect { case Left(item) =>
          val (expr, aliasOpt) = SqlClauses.splitAlias(item)
          val name = aliasOpt.orElse(SqlClauses.plainColumnName(expr)).getOrElse(expr)
          // quoted aliases arrive unquoted from splitAlias and are fine
          // when identifier-safe; spaces/punctuation would break dim-token
          // resolution through the whole query surface — same policy as
          // measure names, failed loudly here instead of an
          // unresolved-column error at query time
          if (aliasOpt.exists(a => !a.forall(Scan.isIdentChar)))
            throw new graft.planner.GraftException(
              s"dimension alias '${aliasOpt.get}' is not a plain identifier; quoted dimension " +
                "aliases with spaces or punctuation are not supported in measure views — use " +
                "an identifier (e.g. return_flag)")
          (name, expr)
        }
        val dimensionExprs = dimPairs.map { case (n, e) => n.toLowerCase -> e }.toMap
        val dimensionOrder = dimPairs.map(_._1)

        val groupByCols = clauses.groupBy
          .map { g =>
            val mask = Scan.buildMask(g)
            Scan.splitTopLevel(g, mask, ',', 0, g.length)
              .map { case (s, e) => g.substring(s, e).trim }
              .filter(c => c.nonEmpty && !measureNames.contains(c.toLowerCase))
          }
          .getOrElse(Nil)

        Some(ParsedMeasureView(
          viewName = viewName,
          orReplace = orRepl != null,
          temporary = temp != null,
          clauses = clauses,
          items = items,
          baseRelationSql = baseRelationSql,
          dimensionExprs = dimensionExprs,
          dimensionOrder = dimensionOrder,
          groupByCols = groupByCols,
          ctePrefix = ctePrefix
        ))
      case _ => None
    }
  }

  /** Split a leading `WITH name [cols] AS (...) [, ...]` CTE list off a view
    * body; returns ("", body) when there is none or it cannot be scanned.
    */
  private def splitWithPrefix(body: String): (String, String) = {
    val mask = Scan.buildMask(body)
    var i = 0
    def skipWs(): Unit = { while (i < body.length && (body.charAt(i).isWhitespace || mask(i))) i += 1 }
    skipWs()
    if (!body.regionMatches(true, i, "WITH", 0, 4) ||
        (i + 4 < body.length && Scan.isIdentChar(body.charAt(i + 4)))) return ("", body)
    i += 4
    skipWs()
    if (body.regionMatches(true, i, "RECURSIVE", 0, 9)) { i += 9; skipWs() }
    var ok = true
    var parsing = true
    while (parsing && ok) {
      skipWs()
      val ns = i
      while (i < body.length && Scan.isIdentChar(body.charAt(i))) i += 1
      if (i == ns) ok = false
      else {
        skipWs()
        if (i < body.length && body.charAt(i) == '(') { // column list
          val c = Scan.matchParen(body, mask, i)
          if (c < 0) ok = false else { i = c + 1; skipWs() }
        }
        if (ok && body.regionMatches(true, i, "AS", 0, 2) &&
            (i + 2 >= body.length || !Scan.isIdentChar(body.charAt(i + 2)))) { i += 2; skipWs() }
        else ok = false
        if (ok && i < body.length && body.charAt(i) == '(') {
          val c = Scan.matchParen(body, mask, i)
          if (c < 0) ok = false else { i = c + 1; skipWs() }
        } else ok = false
        if (ok) {
          if (i < body.length && body.charAt(i) == ',') i += 1 else parsing = false
        }
      }
    }
    if (!ok) ("", body) else (body.substring(0, i).trim, body.substring(i).trim)
  }

  /** "expr AS MEASURE name" -> Some((expr, name)). */
  private def parseMeasureItem(item: String): Option[(String, String)] = {
    val mask = Scan.buildMask(item)
    val seq = Scan.findTopLevelSeq(item, mask, Seq("AS", "MEASURE"), 0, item.length)
    if (seq == null) return None
    val (start, end) = seq
    val name = item.substring(end).trim
    val cleanName =
      if (name.length > 1 && ((name.head == '"' && name.last == '"') ||
          (name.head == '`' && name.last == '`')))
        name.substring(1, name.length - 1)
      else name
    if (cleanName.isEmpty) return None
    // quoted names are fine when identifier-safe (case preservation); a
    // name with spaces/punctuation would need quoting through the whole
    // AGGREGATE() call surface — fail loudly instead of leaking the raw
    // `AS MEASURE` text into a Spark parse error
    if (!cleanName.forall(Scan.isIdentChar))
      throw new graft.planner.GraftException(
        s"measure name '$cleanName' is not a plain identifier; quoted measure names with " +
          "spaces or punctuation are not supported — use an identifier (e.g. total_qty)")
    Some((item.substring(0, start).trim, cleanName))
  }

  /** Extract view name from a DROP VIEW statement (reference:
    * extract_drop_view_name, measures.rs:1465).
    */
  private val dropRe =
    """(?is)^\s*DROP\s+(?:TEMPORARY\s+|TEMP\s+)?VIEW\s+(IF\s+EXISTS\s+)?([A-Za-z_][\w.]*|"[^"]+"|`[^`]+`)(?:\s+CASCADE|\s+RESTRICT)?\s*;?\s*$""".r
  def dropViewName(sql: String): Option[String] = sql match {
    case dropRe(_, rawName) =>
      Some(rawName.stripPrefix("\"").stripSuffix("\"").stripPrefix("`").stripSuffix("`"))
    case _ => None
  }
}
