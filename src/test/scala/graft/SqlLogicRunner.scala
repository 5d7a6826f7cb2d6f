package graft

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

/** Minimal sqllogictest runner for the reference corpus
  * (files under /root/reference/test/sql — sqllogictest format: `statement
  * ok/error`, `query <types> [rowsort]` with inline golden results).
  *
  * DuckDB-isms are translated on the fly:
  *  - CREATE TABLE/INSERT INTO VALUES become session temp views rebuilt
  *    from accumulated VALUES rows (no warehouse state, fully re-runnable)
  *  - TEXT/bare VARCHAR -> STRING
  *  - unknown SET statements are ignored (SET warnings_as_errors is real)
  *
  * Directives whose setup could not be translated are counted as skipped,
  * never as passes.
  */
final class SqlLogicRunner(spark: SparkSession, engine: GraftEngine) {

  /** `errorSkips` counts `query` directives that THREW at execution —
    * tracked apart from untranslatable-setup skips so a regression that
    * turns passing queries into errors can be gated (a plain `skipped`
    * ceiling would let errors hide among setup skips).
    */
  case class Summary(var statementsOk: Int = 0, var statementErrOk: Int = 0,
                     var queriesPassed: Int = 0, var queriesFailed: Int = 0,
                     var skipped: Int = 0, var errorSkips: Int = 0,
                     var setupSkips: Int = 0, var poisonedSkips: Int = 0,
                     var engineDefinedSkips: Int = 0,
                     val failures: mutable.ListBuffer[String] = mutable.ListBuffer()) {
    /** Exact census of every skip category — asserted by CorpusSuite so a
      * NEW skip of any kind is a test failure, not silent drift.
      */
    def skipCensus: Map[String, Int] = Map(
      "setup-untranslatable" -> setupSkips,
      "poisoned-reference" -> poisonedSkips,
      "engine-defined" -> engineDefinedSkips,
      "execution-error" -> errorSkips)
  }

  // virtual tables: name -> (colsDdl, rows)
  private case class VTable(cols: Seq[(String, String)], rows: mutable.ListBuffer[String])
  private val vtables = mutable.Map[String, VTable]()
  // tables whose setup failed -> poisoned; dependent directives are skipped
  private val poisoned = mutable.Set[String]()

  private def translateType(t: String): String = {
    val u = t.trim.toUpperCase
    if (u.endsWith("[]")) s"ARRAY<${translateType(u.stripSuffix("[]"))}>"
    else if (u == "TEXT" || u == "VARCHAR") "STRING"
    else t.trim
  }

  private def refreshView(name: String): Unit = {
    val vt = vtables(name.toLowerCase)
    val cols = vt.cols.map(_._1).mkString(", ")
    if (vt.rows.isEmpty) {
      val proj = vt.cols.map { case (c, t) => s"CAST(NULL AS ${translateType(t)}) AS $c" }.mkString(", ")
      spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $name AS SELECT $proj WHERE 1=0")
    } else {
      val proj = vt.cols.map { case (c, t) => s"CAST($c AS ${translateType(t)}) AS $c" }.mkString(", ")
      // Shims translate DuckDB-isms in VALUES text ([..] array literals)
      spark.sql(graft.functions.Shims(
        s"CREATE OR REPLACE TEMPORARY VIEW $name AS SELECT $proj FROM (SELECT * FROM VALUES ${vt.rows.mkString(", ")} AS __t($cols))"))
    }
  }

  private val createTableRe =
    """(?is)^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMPORARY\s+|TEMP\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([A-Za-z_]\w*)\s*\((.*)\)\s*;?\s*$""".r
  private val insertRe =
    """(?is)^\s*INSERT\s+INTO\s+([A-Za-z_]\w*)\s+VALUES\s*(.*?);?\s*$""".r
  private val insertSelRe =
    """(?is)^\s*INSERT\s+INTO\s+([A-Za-z_]\w*)(?:\s+BY\s+NAME)?\s*(\()?\s*(?:/\*.*?\*/\s*|--[^\n]*\n\s*)*((?:SELECT|WITH)\b.*)$""".r
  private val dropTableRe =
    """(?is)^\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([A-Za-z_]\w*)\s*;?\s*$""".r
  private val setRe = """(?is)^\s*SET\s+(\w+)\s*=.*$""".r
  private val prepRe = """(?is)^\s*PREPARE\s+([A-Za-z_]\w*)\s+AS\s+(.*)$""".r
  private val execPrepRe = """(?is)^\s*EXECUTE\s+([A-Za-z_]\w*)\s*;?\s*$""".r
  private val preparedStmts = mutable.Map[String, String]()

  private def sqlLiteral(a: Any): String = a match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case t: java.sql.Timestamp => s"TIMESTAMP '${t.toString}'"
    case d: java.sql.Date => s"DATE '${d.toString}'"
    case x => x.toString
  }

  /** Execute one statement with virtual-table translation. Multi-statement
    * blocks keep the engine's batch semantics unless they touch virtual
    * tables, in which case each statement is translated individually.
    */
  private def exec(sqlRaw: String): Unit = {
    val parts = syntax.Scan.splitStatements(sqlRaw)
    val touchesVtable = parts.exists {
      case createTableRe(_, _) => true
      case insertRe(name, _) => vtables.contains(name.toLowerCase)
      case insertSelRe(name, _, _) => vtables.contains(name.toLowerCase)
      case dropTableRe(_, name) => vtables.contains(name.toLowerCase)
      case _ => false
    }
    if (parts.length > 1 && !touchesVtable) {
      // preserve batch semantics (temp measure views etc.)
      val df = engine.sql(sqlRaw)
      if (parts.last.trim.toUpperCase.startsWith("SELECT") ||
          parts.last.trim.toUpperCase.startsWith("WITH")) df.collect()
      return
    }
    for (sqlStmt <- parts) execOne(sqlStmt)
  }

  private def execOne(sqlRaw: String): Unit = {
    // shim DuckDB-isms (dollar quotes etc.) before structural matching
    val sql = graft.functions.Shims(sqlRaw.trim.stripSuffix(";"))
    sql match {
      case createTableRe(name, colsDdl) =>
        val mask = syntax.Scan.buildMask(colsDdl)
        val cols = syntax.Scan.splitTopLevel(colsDdl, mask, ',', 0, colsDdl.length)
          .map { case (s, e) => colsDdl.substring(s, e).trim }
          .filter(_.nonEmpty)
          .map { c =>
            val parts = c.split("\\s+", 2)
            (parts(0), if (parts.length > 1) parts(1) else "STRING")
          }
        vtables(name.toLowerCase) = VTable(cols, mutable.ListBuffer())
        poisoned.remove(name.toLowerCase)
        refreshView(name)
      case insertRe(name, values) if vtables.contains(name.toLowerCase) =>
        vtables(name.toLowerCase).rows += values.trim.stripSuffix(";")
        refreshView(name)
      case insertSelRe(name, paren, body0) if vtables.contains(name.toLowerCase) =>
        val body = if (paren != null) body0.trim.stripSuffix(";").stripSuffix(")")
                   else body0.trim.stripSuffix(";")
        val rows = engine.sql(body).collect()
        if (rows.nonEmpty) {
          val vt = vtables(name.toLowerCase)
          vt.rows ++= rows.map(r => "(" + r.toSeq.map(sqlLiteral).mkString(", ") + ")")
          refreshView(name)
        }
      case dropTableRe(_, name) if vtables.contains(name.toLowerCase) =>
        vtables.remove(name.toLowerCase)
        spark.catalog.dropTempView(name)
      case setRe(key) if !key.equalsIgnoreCase("warnings_as_errors") =>
        () // DuckDB session knob we don't have
      case prepRe(name, body) =>
        preparedStmts(name.toLowerCase) = body.trim.stripSuffix(";")
      case execPrepRe(name) =>
        execOne(preparedStmts.getOrElse(name.toLowerCase,
          throw new IllegalStateException(s"unknown prepared stmt $name")))
      case _ =>
        val df = engine.sql(sql)
        val u = sql.trim.toUpperCase
        if (u.startsWith("SELECT") || u.startsWith("WITH") || u.startsWith("SEMANTIC"))
          df.collect() // force runtime errors (e.g. window single-value guard)
    }
  }

  private def runQuery(sql: String): Seq[Seq[String]] = {
    val df = engine.sql(sql)
    df.collect().toSeq.map(_.toSeq.map(formatCell))
  }

  private def formatCell(a: Any): String = a match {
    case null => "NULL"
    case d: java.lang.Double => if (d == d.longValue().toDouble && math.abs(d) < 1e15) s"${d.longValue()}.0" else d.toString
    case f: java.lang.Float => formatCell(f.toDouble)
    case b: java.math.BigDecimal => formatCell(b.doubleValue())
    case b: java.lang.Boolean => if (b) "true" else "false"
    case t: java.sql.Timestamp => t.toString.stripSuffix(".0")
    case d: java.sql.Date => d.toString
    case s: scala.collection.Seq[_] => s.map(formatCell).mkString("[", ", ", "]") // DuckDB list format
    case x => x.toString
  }

  /** Numeric-tolerant cell comparison (DuckDB and the JVM print float
    * shortest-reprs slightly differently).
    */
  private def cellsMatch(got: String, want: String): Boolean = {
    if (got == want) return true
    (toNum(got), toNum(want)) match {
      case (Some(a), Some(b)) =>
        math.abs(a - b) <= 1e-6 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
      case _ => got.stripSuffix(".0") == want.stripSuffix(".0")
    }
  }
  private def toNum(s: String): Option[Double] =
    try Some(s.toDouble) catch { case _: Exception => None }

  def run(path: String, sectionLimit: Int = Int.MaxValue): Summary = {
    val summary = Summary()
    // the corpus deliberately contains malformed UTF-8 (sanitizer tests);
    // decode with replacement instead of throwing
    val lines = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8).split("\n", -1).toVector
    var i = 0
    def collectSql(): String = {
      val sb = new StringBuilder
      while (i < lines.length && lines(i).trim.nonEmpty && lines(i).trim != "----") {
        sb.append(lines(i)).append("\n")
        i += 1
      }
      sb.toString.trim
    }
    def collectGolden(): Seq[String] = {
      val out = mutable.ListBuffer[String]()
      if (i < lines.length && lines(i).trim == "----") {
        i += 1
        while (i < lines.length && lines(i).trim.nonEmpty) {
          out += lines(i)
          i += 1
        }
      }
      out.toSeq
    }

    while (i < lines.length) {
      val line = lines(i).trim
      if (line.startsWith("statement ok")) {
        i += 1
        val sql = collectSql()
        try { exec(sql); summary.statementsOk += 1 }
        catch {
          case e: Exception =>
            summary.skipped += 1
            summary.setupSkips += 1
            summary.failures += s"SKIP(setup): ${sql.take(90).replaceAll("\\s+", " ")} -> ${Option(e.getMessage).getOrElse("").linesIterator.toSeq.headOption.getOrElse("").take(90)}"
            // poison tables/views this statement would have created
            for (m <- "(?is)CREATE\\s+(?:OR\\s+REPLACE\\s+)?(?:TEMPORARY\\s+)?(?:TABLE|VIEW)\\s+([A-Za-z_]\\w*)".r.findAllMatchIn(sql))
              poisoned += m.group(1).toLowerCase
        }
      } else if (line.startsWith("statement error")) {
        i += 1
        val sql = collectSql()
        collectGolden() // expected error pattern — any failure accepted
        try {
          exec(sql)
          // executing without error is a FAIL only when setup was healthy
          if (referencedPoisoned(sql)) { summary.skipped += 1; summary.poisonedSkips += 1 }
          else { summary.queriesFailed += 1; summary.failures += s"expected error but succeeded: ${sql.take(120)}" }
        } catch { case _: Exception => summary.statementErrOk += 1 }
      } else if (line.startsWith("query")) {
        val rowsort = line.contains("rowsort")
        i += 1
        val sql = collectSql()
        val golden = collectGolden()
        if (referencedPoisoned(sql)) {
          summary.skipped += 1
          summary.poisonedSkips += 1
        }
        else {
          try {
            var got = runQuery(sql)
            // golden rows are tab-separated; sqllogictest also allows
            // one-value-per-line format for single-column results
            var want = golden.map(_.split("\t").toSeq.map(_.trim))
            if (rowsort) {
              got = got.sortBy(_.mkString(""))
              want = want.sortBy(_.mkString(""))
            }
            val ok = got.length == want.length &&
              got.zip(want).forall { case (g, w) =>
                g.length == w.length && g.zip(w).forall { case (a, b) => cellsMatch(a, b) }
              }
            if (ok) summary.queriesPassed += 1
            else {
              summary.queriesFailed += 1
              summary.failures += s"mismatch: ${sql.take(120).replaceAll("\\s+", " ")} got=${got.take(3)} want=${want.take(3)}"
            }
          } catch {
            case e: Exception =>
              summary.skipped += 1
              summary.errorSkips += 1
              summary.failures += s"SKIP(error): ${sql.take(100).replaceAll("\\s+", " ")} -> ${Option(e.getMessage).getOrElse("").linesIterator.toSeq.headOption.getOrElse("")}"
          }
        }
      } else i += 1
    }
    summary
  }

  private def referencedPoisoned(sql: String): Boolean =
    poisoned.exists(p => sql.toLowerCase.contains(p))
}
