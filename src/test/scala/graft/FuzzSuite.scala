package graft

import scala.util.Random

/** Differential grammar fuzzer for the measure surface (round-8 verdict
  * item 3): random measure views (decomposable / composite / non-
  * decomposable / derived) x random query shapes (dim subsets, WHERE,
  * bare refs, 0-3 chained/multi AT modifiers in random order) are run
  * through the engine and compared against an INDEPENDENT row-level
  * evaluator written directly from the reference fold semantics
  * (measures.rs:5791-6176): the evaluator works on collected Scala rows
  * and structural generator ASTs — it shares no code with the SQL
  * expansion pipeline (ContextFold/QueryExpander), so any divergence is
  * a bug in expansion, frame planning, or execution.
  *
  * Frame-eval semantics the evaluator mirrors:
  *  - context rows = base, filtered by NoFilter/Visible(query WHERE)/
  *    AT-WHERE cond, then correlated on the query's group dims (minus
  *    ALL-removed; none when grand/AT-WHERE) plus SET pins
  *  - empty CORRELATED context -> NULL (left-join miss); empty SCALAR
  *    context (no correlation keys) -> aggregate over empty input
  *    (COUNT = 0, others NULL)
  *
  * Window measures are excluded (single-value guard semantics are
  * pinned by SemanticsSuite/corpus); CURRENT and expression dims are
  * covered by their dedicated suites.
  */
class FuzzSuite extends SparkSpec {

  lazy val engine: GraftEngine = GraftEngine(spark)

  // ---------------------------------------------------------------- data

  case class R(da: String, db: Int, dc: String, x: Double, y: Double)

  private def mkData(rnd: Random, n: Int): Seq[R] =
    Seq.fill(n)(R(
      Seq("A", "B", "C")(rnd.nextInt(3)),
      1 + rnd.nextInt(3),
      Seq("X", "Y")(rnd.nextInt(2)),
      (1 + rnd.nextInt(100)).toDouble,
      (1 + rnd.nextInt(10)).toDouble))

  // ------------------------------------------------------------ measures

  /** (name, view SQL fragment, evaluator over non-empty context rows,
    * countLike = yields 0 (not NULL) over an empty scalar context)
    */
  case class Meas(name: String, sql: String, eval: Seq[R] => Any, countLike: Boolean = false)

  private val measures: Seq[Meas] = Seq(
    Meas("f_sum", "SUM(x)", rs => rs.map(_.x).sum),
    Meas("f_cnt", "COUNT(*)", rs => rs.size.toLong, countLike = true),
    Meas("f_min", "MIN(x)", rs => rs.map(_.x).min),
    Meas("f_maxy", "MAX(y)", rs => rs.map(_.y).max),
    Meas("f_avg", "AVG(x)", rs => rs.map(_.x).sum / rs.size),
    Meas("f_cd", "COUNT(DISTINCT da)", rs => rs.map(_.da).distinct.size.toLong, countLike = true),
    Meas("f_ratio", "SUM(x)/SUM(y)", rs => rs.map(_.x).sum / rs.map(_.y).sum),
    Meas("f_spread", "MAX(x)-MIN(x)", rs => rs.map(_.x).max - rs.map(_.x).min),
    // derived: sibling refs, substituted into ONE context at expansion
    Meas("f_per", "f_sum / f_cnt", rs => rs.map(_.x).sum / rs.size))

  private val derivedNames = Set("f_per")

  // -------------------------------------------------- predicates (WHERE)

  case class Pred(sql: String, p: R => Boolean)
  private val preds: Seq[Pred] = Seq(
    Pred("da = 'A'", _.da == "A"),
    Pred("db <> 2", _.db != 2),
    Pred("x > 50", _.x > 50),
    Pred("dc = 'X' AND db < 3", r => r.dc == "X" && r.db < 3),
    Pred("y >= 3", _.y >= 3))

  // ------------------------------------------------- modifiers (the AST)

  sealed trait Mod
  case object AllGlobal extends Mod
  case class AllDim(d: String) extends Mod
  /** SET dim = value; value is a literal or the outer-dim shift `db + 1`. */
  case class SetMod(d: String, valueSql: String, value: Map[String, Any] => Any) extends Mod
  case class WhereMod(pr: Pred) extends Mod
  case object Visible extends Mod

  private def renderMod(m: Mod): String = m match {
    case AllGlobal => "ALL"
    case AllDim(d) => s"ALL $d"
    case SetMod(d, v, _) => s"SET $d = $v"
    case WhereMod(pr) => s"WHERE ${pr.sql}"
    case Visible => "VISIBLE"
  }

  private def randomMod(rnd: Random, dims: Seq[String]): Mod = rnd.nextInt(6) match {
    case 0 => AllGlobal
    case 1 => AllDim(Seq("da", "db", "dc")(rnd.nextInt(3)))
    case 2 =>
      rnd.nextInt(3) match {
        case 0 =>
          val v = Seq("'A'", "'B'", "'C'", "'Z'")(rnd.nextInt(4))
          SetMod("da", v, _ => v.stripPrefix("'").stripSuffix("'"))
        case 1 =>
          val v = 1 + rnd.nextInt(4) // 4 = absent -> empty context
          SetMod("db", v.toString, _ => v)
        case 2 if dims.contains("db") =>
          // the YoY pattern: value references the OUTER dim
          SetMod("db", "db + 1", g => g("db").asInstanceOf[Int] + 1)
        case _ =>
          val v = Seq("'X'", "'Y'")(rnd.nextInt(2))
          SetMod("dc", v, _ => v.stripPrefix("'").stripSuffix("'"))
      }
    case 3 => WhereMod(preds(rnd.nextInt(preds.size)))
    case 4 => Visible
    case _ => AllDim(dims(rnd.nextInt(dims.size))) // bias toward grouped dims
  }

  // --------------------------- independent fold (measures.rs:5791-6176)

  case class RefCtx(grand: Boolean, removed: List[String], dropCorr: Boolean,
                    sets: List[SetMod], filter: Option[Either[Unit, Pred]])
  // filter: None = NoFilter, Some(Left(())) = Visible, Some(Right(p)) = AT-WHERE

  private def foldRef(mods: List[Mod], paperDefault: Boolean): RefCtx = {
    if (mods.isEmpty)
      return RefCtx(grand = false, Nil, dropCorr = false, Nil,
        if (paperDefault) None else Some(Left(())))
    if (mods.length == 1) return mods.head match {
      case AllGlobal => RefCtx(grand = true, Nil, dropCorr = false, Nil, None)
      case AllDim(d) => RefCtx(grand = false, List(d), dropCorr = false, Nil, None)
      case s: SetMod =>
        // single-modifier SET removes its dim from correlation
        RefCtx(grand = false, List(s.d), dropCorr = false, List(s), None)
      case WhereMod(p) => RefCtx(grand = false, Nil, dropCorr = true, Nil, Some(Right(p)))
      case Visible => RefCtx(grand = false, Nil, dropCorr = false, Nil, Some(Left(())))
    }
    val allAreAll = mods.forall { case AllGlobal | AllDim(_) => true; case _ => false }
    if (allAreAll) {
      if (mods.contains(AllGlobal)) return RefCtx(grand = true, Nil, dropCorr = false, Nil, None)
      return RefCtx(grand = false, mods.collect { case AllDim(d) => d }, dropCorr = false, Nil, None)
    }
    val hasSet = mods.exists(_.isInstanceOf[SetMod])
    var filter: Option[Either[Unit, Pred]] = None
    var hasAllGlobal = false
    val sets = scala.collection.mutable.ListBuffer[SetMod]()
    val removed = scala.collection.mutable.ListBuffer[String]()
    for (m <- mods.reverse) m match {
      case AllGlobal => hasAllGlobal = true; filter = None; sets.clear()
      case AllDim(d) => removed += d
      case Visible => if (!hasSet && !hasAllGlobal) filter = Some(Left(()))
      case WhereMod(p) => if (!hasAllGlobal) filter = Some(Right(p))
      case s: SetMod =>
        if (!hasAllGlobal && !removed.exists(_.equalsIgnoreCase(s.d))) sets += s
    }
    if (hasAllGlobal && sets.isEmpty) RefCtx(grand = true, Nil, dropCorr = false, Nil, None)
    else RefCtx(grand = false, removed.toList, dropCorr = false, sets.toList, filter)
  }

  // ------------------------------------------------- row-level evaluator

  private def dimVal(r: R, d: String): Any = d match {
    case "da" => r.da; case "db" => r.db; case "dc" => r.dc
  }

  private def expectedValue(base: Seq[R], visible: Option[Pred], qDims: Seq[String],
                            g: Map[String, Any], m: Meas, ctx: RefCtx): Any = {
    val afterFilter = ctx.filter match {
      case None => base
      case Some(Left(())) => visible.fold(base)(p => base.filter(p.p))
      case Some(Right(p)) => base.filter(p.p)
    }
    val corr =
      if (ctx.grand || ctx.dropCorr) Nil
      else qDims.filterNot(d => ctx.removed.exists(_.equalsIgnoreCase(d)))
    val rows = afterFilter.filter(r =>
      corr.forall(d => dimVal(r, d) == g(d)) &&
        ctx.sets.forall(s => dimVal(r, s.d) == s.value(g)))
    val scalarFrame = corr.isEmpty && ctx.sets.isEmpty
    if (rows.nonEmpty) m.eval(rows)
    else if (scalarFrame && m.countLike) 0L
    else null
  }

  // ------------------------------------------------------------ plumbing

  private def cell(a: Any): String = a match {
    case null => "NULL"
    case d: Double =>
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.stripTrailingZeros.toPlainString
    case x => x.toString
  }

  private def runCase(rnd: Random, caseId: String): Unit = {
    val data = mkData(rnd, 30 + rnd.nextInt(50))
    val values = data.map(r => s"('${r.da}', ${r.db}, '${r.dc}', ${r.x}, ${r.y})").mkString(", ")
    engine.sql(s"CREATE OR REPLACE TEMPORARY VIEW fuzz_base AS " +
      s"SELECT da, db, dc, CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y " +
      s"FROM VALUES $values AS t(da, db, dc, x, y)")
    val nonDerived = measures.filterNot(m => derivedNames(m.name))
    val viewMeasures = (nonDerived.map(m => s"${m.sql} AS MEASURE ${m.name}") :+
      s"${measures.find(_.name == "f_per").get.sql} AS MEASURE f_per").mkString(", ")
    engine.sql(s"CREATE OR REPLACE VIEW fuzz_v AS SELECT da, db, dc, $viewMeasures FROM fuzz_base")

    val qDims = rnd.shuffle(Seq("da", "db", "dc")).take(1 + rnd.nextInt(2)).sorted
    val where = if (rnd.nextInt(3) == 0) Some(preds(rnd.nextInt(preds.size))) else None
    val nCalls = 1 + rnd.nextInt(2)
    case class Call(m: Meas, mods: List[Mod], bare: Boolean, alias: String)
    val calls = (0 until nCalls).map { i =>
      val m = measures(rnd.nextInt(measures.size))
      val bare = rnd.nextInt(6) == 0
      val mods = if (bare) Nil else List.fill(rnd.nextInt(4))(randomMod(rnd, qDims))
      Call(m, mods, bare, s"c$i")
    }
    def renderCall(c: Call): String =
      if (c.bare) s"${c.m.name} AS ${c.alias}"
      else {
        val core = s"AGGREGATE(${c.m.name})"
        // Grammar constraint (mirrors the reference parser,
        // measures.rs:1025-1086): SET and WHERE consume the remainder of
        // their AT block, and a bare ALL is only global when nothing
        // follows it in the block — so those three must END a block; any
        // later modifiers open a new chained AT. Non-terminal boundaries
        // are additionally split at random to exercise chained folds.
        val blocks = scala.collection.mutable.ListBuffer[List[Mod]]()
        var cur = scala.collection.mutable.ListBuffer[Mod]()
        for (m <- c.mods) {
          cur += m
          val terminal = m match {
            case AllGlobal | _: SetMod | _: WhereMod => true
            case _ => false
          }
          if (terminal || rnd.nextInt(3) == 0) { blocks += cur.toList; cur = scala.collection.mutable.ListBuffer() }
        }
        if (cur.nonEmpty) blocks += cur.toList
        val at = blocks.map(b => s" AT (${b.map(renderMod).mkString(" ")})").mkString
        s"$core$at AS ${c.alias}"
      }
    val sql = s"SELECT ${(qDims ++ calls.map(renderCall)).mkString(", ")} FROM fuzz_v" +
      where.fold("")(p => s" WHERE ${p.sql}") +
      s" GROUP BY ${qDims.mkString(", ")}"

    val got = rows(engine.sql(sql))

    val visibleRows = where.fold(data)(p => data.filter(p.p))
    val groups = visibleRows.map(r => qDims.map(d => d -> dimVal(r, d)).toMap).distinct
    val expected = groups.map { g =>
      val dimCells = qDims.map(d => cell(g(d)))
      val valCells = calls.map { c =>
        val ctx = foldRef(c.mods, paperDefault = c.bare)
        cell(expectedValue(data, where, qDims, g, c.m, ctx))
      }
      dimCells ++ valCells
    }.sortBy(_.mkString(""))

    assert(got == expected,
      s"\n[$caseId] DIVERGENCE\nsql: $sql\nwhere: ${where.map(_.sql)}\n" +
        s"calls: ${calls.map(c => s"${c.m.name} bare=${c.bare} mods=${c.mods}")}\n" +
        s"got:\n${got.map(_.mkString("\t")).mkString("\n")}\n" +
        s"expected:\n${expected.map(_.mkString("\t")).mkString("\n")}")
  }

  test("differential fuzz: 320 random measure queries match the row-level evaluator") {
    val seed = 20260814
    val rnd = new Random(seed)
    var i = 0
    while (i < 320) {
      // fresh data every 20 cases; fresh queries every case
      if (i % 20 == 0) rnd.setSeed(seed + i)
      runCase(rnd, s"seed=$seed case=$i")
      i += 1
    }
  }

  // ------------------- axis 2: expression dims + CURRENT in SET values

  /** A query dimension: SQL text, its select alias, and a row evaluator.
    * Expression dims exercise the norm-text dimMatches path; CURRENT is
    * restricted to the simple dims (the engine's CURRENT(expr-dim)
    * interaction is pinned by its own suites, not fuzzed here).
    */
  case class QDim(sql: String, alias: String, ev: R => Any, simple: Boolean)

  // Expression dims must be FUNCTION-CALL-shaped: the AT grammar's
  // expression_or_identifier (reference measures.rs:1042-1047 and the
  // engine's mirror) parses `<ident>(...)` or a bare identifier — an infix
  // expression like `db % 2` parses as ALL db with `% 2` dropped, so such
  // a dim is simply not addressable from an AT clause (fuzzer finding).
  private val dimPool: Seq[QDim] = Seq(
    QDim("da", "da", _.da, simple = true),
    QDim("db", "db", _.db, simple = true),
    QDim("dc", "dc", _.dc, simple = true),
    QDim("upper(da)", "e_ud", _.da.toUpperCase, simple = false),
    QDim("pmod(db, 2)", "e_dbp", _.db % 2, simple = false))

  /** WHERE predicates that additionally record which simple dims they pin
    * to a constant via a top-level equality conjunct (the engine's
    * pinnedConstant analysis) — CURRENT over an ungrouped pinned dim
    * resolves to that constant.
    */
  case class PredP(sql: String, p: R => Boolean, pins: Map[String, Any])
  private val predPool: Seq[PredP] = Seq(
    PredP("da = 'A'", _.da == "A", Map("da" -> "A")),
    PredP("db = 2", _.db == 2, Map("db" -> 2)),
    PredP("db = 2 AND x > 30", r => r.db == 2 && r.x > 30, Map("db" -> 2)),
    PredP("x > 50", _.x > 50, Map.empty),
    PredP("dc = 'X'", _.dc == "X", Map("dc" -> "X")))

  sealed trait ModE
  case object EAllGlobal extends ModE
  case class EAllDim(d: QDim) extends ModE
  case class EVisible() extends ModE
  case class EWhere(pr: PredP) extends ModE
  /** SET d = <literal> or SET d = CURRENT d. */
  case class ESet(d: QDim, valueSql: String, isCurrent: Boolean, lit: Any) extends ModE

  private def normSql(s: String): String = s.toLowerCase.replaceAll("\\s+", "")

  private def renderModE(m: ModE): String = m match {
    case EAllGlobal => "ALL"
    case EAllDim(d) => s"ALL ${d.sql}"
    case EVisible() => "VISIBLE"
    case EWhere(pr) => s"WHERE ${pr.sql}"
    case ESet(d, v, _, _) => s"SET ${d.sql} = $v"
  }

  private def randomModE(rnd: Random, qDims: Seq[QDim]): ModE = rnd.nextInt(6) match {
    case 0 => EAllGlobal
    case 1 | 5 =>
      // bias toward grouped dims but include ungrouped pool dims
      val d = if (rnd.nextBoolean() && qDims.nonEmpty) qDims(rnd.nextInt(qDims.size))
              else dimPool(rnd.nextInt(dimPool.size))
      EAllDim(d)
    case 2 => EVisible()
    case 3 => EWhere(predPool(rnd.nextInt(predPool.size)))
    case _ =>
      val d = dimPool(rnd.nextInt(dimPool.size))
      if (d.simple && rnd.nextBoolean())
        ESet(d, s"CURRENT ${d.sql}", isCurrent = true, lit = null)
      else d.sql match {
        case "da" | "upper(da)" =>
          val v = Seq("'A'", "'B'", "'Z'")(rnd.nextInt(3))
          ESet(d, v, isCurrent = false, v.stripPrefix("'").stripSuffix("'"))
        case "dc" =>
          val v = Seq("'X'", "'Y'")(rnd.nextInt(2))
          ESet(d, v, isCurrent = false, v.stripPrefix("'").stripSuffix("'"))
        case "db" =>
          val v = 1 + rnd.nextInt(4)
          ESet(d, v.toString, isCurrent = false, v)
        case _ => // db % 2
          val v = rnd.nextInt(2)
          ESet(d, v.toString, isCurrent = false, v)
      }
  }

  private def foldRefE(mods: List[ModE], qDims: Seq[QDim]): (Boolean, List[QDim], Boolean, List[ESet], Option[Either[Unit, PredP]]) = {
    // returns (grand, removed, dropCorr, sets, filter) with the same
    // path-dependent rules as foldRef, dims compared by normalized text
    def asRemoved(d: QDim): QDim = d
    if (mods.isEmpty) return (false, Nil, false, Nil, Some(Left(())))
    if (mods.length == 1) return mods.head match {
      case EAllGlobal => (true, Nil, false, Nil, None)
      case EAllDim(d) => (false, List(d), false, Nil, None)
      case s: ESet => (false, List(asRemoved(s.d)), false, List(s), None)
      case EWhere(p) => (false, Nil, true, Nil, Some(Right(p)))
      case EVisible() => (false, Nil, false, Nil, Some(Left(())))
    }
    val allAreAll = mods.forall { case EAllGlobal | EAllDim(_) => true; case _ => false }
    if (allAreAll) {
      if (mods.contains(EAllGlobal)) return (true, Nil, false, Nil, None)
      return (false, mods.collect { case EAllDim(d) => d }, false, Nil, None)
    }
    val hasSet = mods.exists(_.isInstanceOf[ESet])
    var filter: Option[Either[Unit, PredP]] = None
    var hasAllGlobal = false
    val sets = scala.collection.mutable.ListBuffer[ESet]()
    val removed = scala.collection.mutable.ListBuffer[QDim]()
    for (m <- mods.reverse) m match {
      case EAllGlobal => hasAllGlobal = true; filter = None; sets.clear()
      case EAllDim(d) => removed += d
      case EVisible() => if (!hasSet && !hasAllGlobal) filter = Some(Left(()))
      case EWhere(p) => if (!hasAllGlobal) filter = Some(Right(p))
      case s: ESet =>
        if (!hasAllGlobal && !removed.exists(r => normSql(r.sql) == normSql(s.d.sql))) sets += s
    }
    if (hasAllGlobal && sets.isEmpty) (true, Nil, false, Nil, None)
    else (false, removed.toList, false, sets.toList, filter)
  }

  private def runExprCase(rnd: Random, caseId: String): Unit = {
    val data = mkData(rnd, 30 + rnd.nextInt(40))
    val values = data.map(r => s"('${r.da}', ${r.db}, '${r.dc}', ${r.x}, ${r.y})").mkString(", ")
    engine.sql(s"CREATE OR REPLACE TEMPORARY VIEW fuzz_base AS " +
      s"SELECT da, db, dc, CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y " +
      s"FROM VALUES $values AS t(da, db, dc, x, y)")
    engine.sql("CREATE OR REPLACE VIEW fuzz_ev AS SELECT da, db, dc, " +
      "SUM(x) AS MEASURE f_sum, COUNT(*) AS MEASURE f_cnt, AVG(x) AS MEASURE f_avg FROM fuzz_base")
    val fm = Map(
      "f_sum" -> ((rs: Seq[R]) => rs.map(_.x).sum: Any),
      "f_cnt" -> ((rs: Seq[R]) => rs.size.toLong: Any),
      "f_avg" -> ((rs: Seq[R]) => rs.map(_.x).sum / rs.size: Any))
    val countLike = Set("f_cnt")

    val qDims = rnd.shuffle(dimPool).take(1 + rnd.nextInt(2))
      .distinctBy(d => normSql(d.sql)).sortBy(_.alias)
    val where = if (rnd.nextInt(3) == 0) Some(predPool(rnd.nextInt(predPool.size))) else None
    val mName = Seq("f_sum", "f_cnt", "f_avg")(rnd.nextInt(3))
    val mods = List.fill(rnd.nextInt(4))(randomModE(rnd, qDims))

    // block rendering under the same grammar constraints as renderCall
    val blocks = scala.collection.mutable.ListBuffer[List[ModE]]()
    var cur = scala.collection.mutable.ListBuffer[ModE]()
    for (m <- mods) {
      cur += m
      val terminal = m match {
        case EAllGlobal | _: ESet | _: EWhere => true
        case _ => false
      }
      if (terminal || rnd.nextInt(3) == 0) { blocks += cur.toList; cur = scala.collection.mutable.ListBuffer() }
    }
    if (cur.nonEmpty) blocks += cur.toList
    val at = blocks.map(b => s" AT (${b.map(renderModE).mkString(" ")})").mkString
    val dimItems = qDims.map(d => s"${d.sql} AS ${d.alias}")
    val sql = s"SELECT ${(dimItems :+ s"AGGREGATE($mName)$at AS c0").mkString(", ")} FROM fuzz_ev" +
      where.fold("")(p => s" WHERE ${p.sql}") +
      s" GROUP BY ${qDims.map(_.sql).mkString(", ")}"

    val got = rows(engine.sql(sql))

    val (grand, removed, dropCorr, sets, filter) = foldRefE(mods, qDims)
    val visibleRows = where.fold(data)(p => data.filter(p.p))
    val groups = visibleRows.map(r => qDims.map(d => d.alias -> d.ev(r)).toMap).distinct
    def setValue(s: ESet, g: Map[String, Any]): Any =
      if (!s.isCurrent) s.lit
      else qDims.find(d => normSql(d.sql) == normSql(s.d.sql)) match {
        case Some(d) => g(d.alias) // grouped -> the outer dim value
        case None => where.flatMap(_.pins.get(s.d.sql)).orNull // pinned or NULL
      }
    val expected = groups.map { g =>
      val afterFilter = filter match {
        case None => data
        case Some(Left(())) => visibleRows
        case Some(Right(p)) => data.filter(p.p)
      }
      val corr =
        if (grand || dropCorr) Nil
        else qDims.filterNot(d => removed.exists(r => normSql(r.sql) == normSql(d.sql)))
      val ctxRows = afterFilter.filter(r =>
        corr.forall(d => d.ev(r) == g(d.alias)) &&
          sets.forall(s => s.d.ev(r) == setValue(s, g)))
      val scalarFrame = corr.isEmpty && sets.isEmpty
      val v =
        if (ctxRows.nonEmpty) fm(mName)(ctxRows)
        else if (scalarFrame && countLike(mName)) 0L
        else null
      qDims.map(d => cell(g(d.alias))) :+ cell(v)
    }.sortBy(_.mkString(""))

    assert(got == expected,
      s"\n[$caseId] DIVERGENCE\nsql: $sql\nwhere: ${where.map(_.sql)}\nmods: $mods\n" +
        s"got:\n${got.map(_.mkString("\t")).mkString("\n")}\n" +
        s"expected:\n${expected.map(_.mkString("\t")).mkString("\n")}")
  }

  test("differential fuzz: 160 expression-dim / CURRENT queries match the evaluator") {
    val seed = 20260815
    val rnd = new Random(seed)
    var i = 0
    while (i < 160) {
      if (i % 20 == 0) rnd.setSeed(seed + i)
      runExprCase(rnd, s"seed=$seed case=$i")
      i += 1
    }
  }

  // --------------------------- axis 3: multi-fact joins of measure views

  case class RA(y: Int, r: String, va: Double)
  case class RB(y: Int, s: String, vb: Double)

  /** Conjunct ownership is NAME-based (tokenOwnedBy: a qualified token is
    * owned by a view when its last part names one of the view's dims or
    * base columns, regardless of the alias): `a.y <> 2021` filters BOTH
    * views' visible frames because both declare dim `y`.
    */
  case class MfPred(sql: String, onA: Option[RA => Boolean], onB: Option[RB => Boolean])

  // MAIN-WHERE pool: only columns the views EXPOSE (dims). A base column
  // like a.va is not a column of the measure view — the single-fact path
  // happens to be lenient (it rewrites into the base), but in multi-fact
  // the dedup pushdown correctly fails analysis on it (fuzzer finding;
  // referencing non-exposed base columns in the outer WHERE is user
  // error). AT (WHERE ...) runs in the view's BASE context, so the
  // per-view AT pools below may use base columns.
  private val mfPreds: Seq[MfPred] = Seq(
    MfPred("a.r = 'US'", Some(_.r == "US"), None),
    MfPred("a.y <> 2021", Some(_.y != 2021), Some(_.y != 2021)),
    MfPred("b.s = 'S1'", None, Some(_.s == "S1")))

  private val mfAtPoolA: Seq[MfPred] = Seq(
    MfPred("a.r = 'US'", Some(_.r == "US"), None),
    MfPred("va > 50", Some(_.va > 50), None))
  private val mfAtPoolB: Seq[MfPred] = Seq(
    MfPred("b.s = 'S1'", None, Some(_.s == "S1")),
    MfPred("vb > 30", None, Some(_.vb > 30)))

  sealed trait MfMod
  case object MfAllGlobal extends MfMod
  case class MfAllDim(d: String) extends MfMod
  case class MfSet(d: String, valueSql: String, value: Any) extends MfMod
  case class MfWhere(p: MfPred) extends MfMod
  case object MfVisible extends MfMod

  private def renderMfMod(m: MfMod): String = m match {
    case MfAllGlobal => "ALL"
    case MfAllDim(d) => s"ALL $d"
    case MfSet(d, v, _) => s"SET $d = $v"
    case MfWhere(p) => s"WHERE ${p.sql}"
    case MfVisible => "VISIBLE"
  }

  private def foldRefMf(mods: List[MfMod]): (Boolean, List[String], Boolean, List[MfSet], Option[Either[Unit, MfPred]]) = {
    if (mods.isEmpty) return (false, Nil, false, Nil, Some(Left(())))
    if (mods.length == 1) return mods.head match {
      case MfAllGlobal => (true, Nil, false, Nil, None)
      case MfAllDim(d) => (false, List(d), false, Nil, None)
      case s: MfSet => (false, List(s.d), false, List(s), None)
      case MfWhere(p) => (false, Nil, true, Nil, Some(Right(p)))
      case MfVisible => (false, Nil, false, Nil, Some(Left(())))
    }
    val allAreAll = mods.forall { case MfAllGlobal | MfAllDim(_) => true; case _ => false }
    if (allAreAll) {
      if (mods.contains(MfAllGlobal)) return (true, Nil, false, Nil, None)
      return (false, mods.collect { case MfAllDim(d) => d }, false, Nil, None)
    }
    val hasSet = mods.exists(_.isInstanceOf[MfSet])
    var filter: Option[Either[Unit, MfPred]] = None
    var hasAllGlobal = false
    val sets = scala.collection.mutable.ListBuffer[MfSet]()
    val removed = scala.collection.mutable.ListBuffer[String]()
    for (m <- mods.reverse) m match {
      case MfAllGlobal => hasAllGlobal = true; filter = None; sets.clear()
      case MfAllDim(d) => removed += d
      case MfVisible => if (!hasSet && !hasAllGlobal) filter = Some(Left(()))
      case MfWhere(p) => if (!hasAllGlobal) filter = Some(Right(p))
      case s: MfSet =>
        if (!hasAllGlobal && !removed.exists(_.equalsIgnoreCase(s.d))) sets += s
    }
    if (hasAllGlobal && sets.isEmpty) (true, Nil, false, Nil, None)
    else (false, removed.toList, false, sets.toList, filter)
  }

  private def runMfCase(rnd: Random, caseId: String): Unit = {
    val years = Seq(2020, 2021, 2022)
    val dataA = Seq.fill(25 + rnd.nextInt(25))(RA(
      years(rnd.nextInt(3)), Seq("US", "EU")(rnd.nextInt(2)), (1 + rnd.nextInt(100)).toDouble))
    val dataB = Seq.fill(25 + rnd.nextInt(25))(RB(
      years(rnd.nextInt(3)), Seq("S1", "S2")(rnd.nextInt(2)), (1 + rnd.nextInt(60)).toDouble))
    engine.sql("CREATE OR REPLACE TEMPORARY VIEW mf_base_a AS SELECT y, r, CAST(va AS DOUBLE) AS va FROM VALUES " +
      dataA.map(x => s"(${x.y}, '${x.r}', ${x.va})").mkString(", ") + " AS t(y, r, va)")
    engine.sql("CREATE OR REPLACE TEMPORARY VIEW mf_base_b AS SELECT y, s, CAST(vb AS DOUBLE) AS vb FROM VALUES " +
      dataB.map(x => s"(${x.y}, '${x.s}', ${x.vb})").mkString(", ") + " AS t(y, s, vb)")
    engine.sql("CREATE OR REPLACE VIEW mf_va AS SELECT y, r, SUM(va) AS MEASURE ma, COUNT(*) AS MEASURE ca FROM mf_base_a")
    engine.sql("CREATE OR REPLACE VIEW mf_vb AS SELECT y, s, SUM(vb) AS MEASURE mb FROM mf_base_b")

    val withR = rnd.nextBoolean()
    val qDims = if (withR) Seq("y", "r") else Seq("y")
    val where: List[MfPred] =
      if (rnd.nextInt(3) == 0) List.fill(1 + rnd.nextInt(2))(mfPreds(rnd.nextInt(mfPreds.size))).distinct
      else Nil

    def randomMfMod(view: Char): MfMod = rnd.nextInt(5) match {
      case 0 => MfAllGlobal
      case 1 =>
        val d = if (view == 'a') Seq("y", "r")(rnd.nextInt(2)) else "y"
        MfAllDim(d)
      case 2 =>
        if (view == 'a' && rnd.nextBoolean()) {
          val v = Seq("'US'", "'EU'", "'XX'")(rnd.nextInt(3))
          MfSet("r", v, v.stripPrefix("'").stripSuffix("'"))
        } else {
          val v = 2019 + rnd.nextInt(5)
          MfSet("y", v.toString, v)
        }
      case 3 =>
        val pool = if (view == 'a') mfAtPoolA else mfAtPoolB
        MfWhere(pool(rnd.nextInt(pool.size)))
      case _ => MfVisible
    }
    val aMeas = Seq("ma", "ca")(rnd.nextInt(2))
    val aMods = List.fill(rnd.nextInt(3))(randomMfMod('a'))
    val bMods = List.fill(rnd.nextInt(3))(randomMfMod('b'))

    def renderAt(mods: List[MfMod]): String = {
      val blocks = scala.collection.mutable.ListBuffer[List[MfMod]]()
      var cur = scala.collection.mutable.ListBuffer[MfMod]()
      for (m <- mods) {
        cur += m
        val terminal = m match {
          case MfAllGlobal | _: MfSet | _: MfWhere => true
          case _ => false
        }
        if (terminal || rnd.nextInt(3) == 0) { blocks += cur.toList; cur = scala.collection.mutable.ListBuffer() }
      }
      if (cur.nonEmpty) blocks += cur.toList
      blocks.map(b => s" AT (${b.map(renderMfMod).mkString(" ")})").mkString
    }
    val dimItems = qDims.map(d => s"a.$d AS $d")
    val sql = s"SELECT ${(dimItems :+ s"AGGREGATE($aMeas)${renderAt(aMods)} AS c0" :+
        s"AGGREGATE(mb)${renderAt(bMods)} AS c1").mkString(", ")} " +
      s"FROM mf_va a JOIN mf_vb b ON a.y = b.y" +
      (if (where.nonEmpty) s" WHERE ${where.map(_.sql).mkString(" AND ")}" else "") +
      s" GROUP BY ${qDims.map(d => s"a.$d").mkString(", ")}"

    val got = rows(engine.sql(sql))

    // groups: dims of the JOINED, WHERE-filtered row set
    val visA = dataA.filter(x => where.forall(p => p.onA.forall(_(x))))
    val visB = dataB.filter(x => where.forall(p => p.onB.forall(_(x))))
    val bYears = visB.map(_.y).toSet
    val joined = visA.filter(x => bYears(x.y))
    val groups = joined.map(x => qDims.map {
      case "y" => "y" -> (x.y: Any); case "r" => "r" -> (x.r: Any)
    }.toMap).distinct

    // per-view evaluation: correlate on the query dims the view DECLARES
    // (name-based dim scoping), visible filter = the name-owned conjuncts
    def evalA(g: Map[String, Any], ctx: (Boolean, List[String], Boolean, List[MfSet], Option[Either[Unit, MfPred]])): Any = {
      val (grand, removed, dropCorr, sets, filter) = ctx
      val afterFilter = filter match {
        case None => dataA
        case Some(Left(())) => dataA.filter(x => where.forall(p => p.onA.forall(_(x))))
        case Some(Right(p)) => dataA.filter(x => p.onA.forall(_(x)))
      }
      val owned = qDims.filter(d => d == "y" || d == "r")
      val corr = if (grand || dropCorr) Nil
                 else owned.filterNot(d => removed.exists(_.equalsIgnoreCase(d)))
      val rows = afterFilter.filter { x =>
        corr.forall(d => (if (d == "y") x.y: Any else x.r: Any) == g(d)) &&
          sets.forall(s => (if (s.d == "y") x.y: Any else x.r: Any) == s.value)
      }
      val scalarFrame = corr.isEmpty && sets.isEmpty
      if (rows.nonEmpty) { if (aMeas == "ma") rows.map(_.va).sum else rows.size.toLong }
      else if (scalarFrame && aMeas == "ca") 0L
      else null
    }
    def evalB(g: Map[String, Any], ctx: (Boolean, List[String], Boolean, List[MfSet], Option[Either[Unit, MfPred]])): Any = {
      val (grand, removed, dropCorr, sets, filter) = ctx
      val afterFilter = filter match {
        case None => dataB
        case Some(Left(())) => dataB.filter(x => where.forall(p => p.onB.forall(_(x))))
        case Some(Right(p)) => dataB.filter(x => p.onB.forall(_(x)))
      }
      // B declares dims y, s — of the query dims only y can correlate
      val owned = qDims.filter(_ == "y")
      val corr = if (grand || dropCorr) Nil
                 else owned.filterNot(d => removed.exists(_.equalsIgnoreCase(d)))
      // SETs on dims B does not declare (r) cannot pin a B frame
      val bSets = sets.filter(s => s.d == "y" || s.d == "s")
      val rows = afterFilter.filter { x =>
        corr.forall(d => (x.y: Any) == g(d)) &&
          bSets.forall(s => (if (s.d == "y") x.y: Any else x.s: Any) == s.value)
      }
      val scalarFrame = corr.isEmpty && bSets.isEmpty
      if (rows.nonEmpty) rows.map(_.vb).sum
      else null
    }
    val ctxA = foldRefMf(aMods)
    val ctxB = foldRefMf(bMods)
    val expected = groups.map { g =>
      qDims.map(d => cell(g(d))) :+ cell(evalA(g, ctxA)) :+ cell(evalB(g, ctxB))
    }.sortBy(_.mkString(""))

    assert(got == expected,
      s"\n[$caseId] DIVERGENCE\nsql: $sql\nwhere: ${where.map(_.sql)}\n" +
        s"aMeas=$aMeas aMods=$aMods\nbMods=$bMods\n" +
        s"got:\n${got.map(_.mkString("\t")).mkString("\n")}\n" +
        s"expected:\n${expected.map(_.mkString("\t")).mkString("\n")}")
  }

  test("differential fuzz: 120 multi-fact join queries match the evaluator") {
    val seed = 20260816
    val rnd = new Random(seed)
    var i = 0
    while (i < 120) {
      if (i % 20 == 0) rnd.setSeed(seed + i)
      runMfCase(rnd, s"seed=$seed case=$i")
      i += 1
    }
  }

  // ------------------------ axis 4a: window measures + single-value guard
  //
  // Reference semantics (measures.rs:5233-5247, LIMITATIONS.md window
  // measures): a window measure evaluates PER ROW over the context's
  // filtered rows (the window partition sees every row passing the frame's
  // filter — correlation and SET pins select groups AFTER the per-row
  // values exist), then each frame group (correlation keys + SET dims)
  // must hold exactly one distinct value; more is an error, an empty
  // correlated group is NULL (join miss), an empty scalar frame is NULL.
  // The frame groups are computed eagerly, so a multi-valued group errors
  // even when no output row would join to it.

  /** Window measure: SQL over the view base, partition dims, aggregator. */
  case class WMeas(name: String, sql: String, part: Seq[String], agg: Seq[R] => Any)

  private val wMeasures: Seq[WMeas] = Seq(
    WMeas("w_g", "SUM(x) OVER ()", Nil, rs => rs.map(_.x).sum),
    WMeas("w_da", "SUM(x) OVER (PARTITION BY da)", Seq("da"), rs => rs.map(_.x).sum),
    WMeas("w_dadb", "SUM(x) OVER (PARTITION BY da, db)", Seq("da", "db"), rs => rs.map(_.x).sum),
    WMeas("w_cnt", "COUNT(*) OVER (PARTITION BY db)", Seq("db"), rs => rs.size.toLong),
    WMeas("w_maxy", "MAX(y) OVER (PARTITION BY dc)", Seq("dc"), rs => rs.map(_.y).max))

  /** Render 0-n modifiers into chained AT blocks under the reference
    * grammar (SET/WHERE/bare-ALL terminate their block).
    */
  private def renderAtBlocks(rnd: Random, mods: List[Mod]): String = {
    val blocks = scala.collection.mutable.ListBuffer[List[Mod]]()
    var cur = scala.collection.mutable.ListBuffer[Mod]()
    for (m <- mods) {
      cur += m
      val terminal = m match {
        case AllGlobal | _: SetMod | _: WhereMod => true
        case _ => false
      }
      if (terminal || rnd.nextInt(3) == 0) { blocks += cur.toList; cur = scala.collection.mutable.ListBuffer() }
    }
    if (cur.nonEmpty) blocks += cur.toList
    blocks.map(b => s" AT (${b.map(renderMod).mkString(" ")})").mkString
  }

  private def runWinCase(rnd: Random, caseId: String): Unit = {
    val data = mkData(rnd, 20 + rnd.nextInt(40))
    val values = data.map(r => s"('${r.da}', ${r.db}, '${r.dc}', ${r.x}, ${r.y})").mkString(", ")
    engine.sql(s"CREATE OR REPLACE TEMPORARY VIEW fuzzw_base AS " +
      s"SELECT da, db, dc, CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y " +
      s"FROM VALUES $values AS t(da, db, dc, x, y)")
    val defs = wMeasures.map(w => s"${w.sql} AS MEASURE ${w.name}").mkString(", ")
    engine.sql(s"CREATE OR REPLACE VIEW fuzzw_v AS SELECT da, db, dc, $defs FROM fuzzw_base")

    val qDims = rnd.shuffle(Seq("da", "db", "dc")).take(1 + rnd.nextInt(2)).sorted
    val where = if (rnd.nextInt(3) == 0) Some(preds(rnd.nextInt(preds.size))) else None
    val wm = wMeasures(rnd.nextInt(wMeasures.size))
    val mods = List.fill(rnd.nextInt(3))(randomMod(rnd, qDims))
    val sql = s"SELECT ${qDims.mkString(", ")}, AGGREGATE(${wm.name})" +
      renderAtBlocks(rnd, mods) + s" AS c0 FROM fuzzw_v" +
      where.fold("")(p => s" WHERE ${p.sql}") +
      s" GROUP BY ${qDims.mkString(", ")}"

    // ---- independent evaluation
    val ctx = foldRef(mods, paperDefault = false)
    val frameRows = ctx.filter match {
      case None => data
      case Some(Left(())) => where.fold(data)(p => data.filter(p.p))
      case Some(Right(p)) => data.filter(p.p)
    }
    def wval(r: R): Any =
      wm.agg(frameRows.filter(r2 => wm.part.forall(d => dimVal(r2, d) == dimVal(r, d))))
    val corr =
      if (ctx.grand || ctx.dropCorr) Nil
      else qDims.filterNot(d => ctx.removed.exists(_.equalsIgnoreCase(d)))
    val frameKeyDims = corr ++ ctx.sets.map(_.d)
    // eager frame groups: every (corr, set-dim) tuple present in the frame
    val frameGroups: Map[Seq[Any], Seq[R]] =
      if (frameKeyDims.isEmpty) Map(Seq.empty[Any] -> frameRows)
      else frameRows.groupBy(r => frameKeyDims.map(d => dimVal(r, d))).toMap
    val multiValued = frameGroups.values.exists(_.map(r => cell(wval(r))).distinct.size > 1)

    if (multiValued) {
      val e = intercept[Exception] { engine.sql(sql).collect() }
      assert(e.getMessage.toLowerCase.contains("not single-valued"),
        s"\n[$caseId] expected single-value guard error\nsql: $sql\ngot: ${e.getMessage}")
      return
    }

    val got = rows(engine.sql(sql))
    val visibleRows = where.fold(data)(p => data.filter(p.p))
    val groups = visibleRows.map(r => qDims.map(d => d -> dimVal(r, d)).toMap).distinct
    val expected = groups.map { g =>
      val key = corr.map(d => g(d)) ++ ctx.sets.map(_.value(g))
      val ctxRows = frameGroups.getOrElse(key, Seq.empty)
        // frame groups keyed on frame-present tuples: a SET pin to an
        // absent value, or a correlation miss, is an empty group -> NULL
      val v = ctxRows.headOption.map(wval).orNull
      qDims.map(d => cell(g(d))) :+ cell(v)
    }.sortBy(_.mkString(""))

    assert(got == expected,
      s"\n[$caseId] DIVERGENCE\nsql: $sql\nwhere: ${where.map(_.sql)}\n" +
        s"wm=${wm.name} mods=$mods\n" +
        s"got:\n${got.map(_.mkString("\t")).mkString("\n")}\n" +
        s"expected:\n${expected.map(_.mkString("\t")).mkString("\n")}")
  }

  test("differential fuzz: 100 window-measure queries match the evaluator") {
    val seed = 20260817
    val rnd = new Random(seed)
    var i = 0
    while (i < 100) {
      if (i % 20 == 0) rnd.setSeed(seed + i)
      runWinCase(rnd, s"seed=$seed case=$i")
      i += 1
    }
  }

  // ------------- axis 5: ROLLUP / CUBE / GROUPING SETS over measure views
  //
  // Pinned semantics (m_rollup / m_groupingsets oracles, corpus): the
  // measure frame still correlates on the FULL query dim list with
  // null-safe equality; a subtotal row carries NULL for its rolled-up
  // dims, the frame (grouped over non-NULL base data) has no NULL keys,
  // so correlated lookups at subtotal rows are join misses -> NULL —
  // UNLESS an AT modifier removes the correlation: AT (ALL) / AT (WHERE)
  // give every row (subtotals included) the scalar value, AT (ALL dim)
  // drops that dim from correlation, and a SET pin replaces it. A SET
  // value that references an outer dim (the YoY shift) evaluates to NULL
  // on rows where that dim is rolled up, matching nothing.

  private def groupingSetsOf(rnd: Random, qDims: Seq[String]): (String, Seq[Seq[String]]) =
    rnd.nextInt(3) match {
      case 0 =>
        val order = rnd.shuffle(qDims)
        (s"ROLLUP(${order.mkString(", ")})",
          (0 to order.size).reverse.map(order.take(_)))
      case 1 =>
        val order = rnd.shuffle(qDims)
        (s"CUBE(${order.mkString(", ")})",
          order.toSet.subsets().map(s => order.filter(s)).toSeq)
      case _ =>
        // 2-4 explicit sets, possibly duplicated, possibly (); the union
        // must cover every selected dim or the SQL itself is invalid
        val sets = Seq.fill(2 + rnd.nextInt(3))(
          rnd.shuffle(qDims).take(rnd.nextInt(qDims.size + 1)).sorted) match {
          case ss if ss.flatten.toSet == qDims.toSet => ss
          case ss => ss :+ qDims
        }
        (s"GROUPING SETS(${sets.map(s => s"(${s.mkString(", ")})").mkString(", ")})",
          sets)
    }

  private def runGsCase(rnd: Random, caseId: String): Unit = {
    val data = mkData(rnd, 30 + rnd.nextInt(50))
    val values = data.map(r => s"('${r.da}', ${r.db}, '${r.dc}', ${r.x}, ${r.y})").mkString(", ")
    engine.sql(s"CREATE OR REPLACE TEMPORARY VIEW fuzzg_base AS " +
      s"SELECT da, db, dc, CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y " +
      s"FROM VALUES $values AS t(da, db, dc, x, y)")
    val defs = measures.filterNot(m => derivedNames(m.name))
      .map(m => s"${m.sql} AS MEASURE ${m.name}")
      .mkString(", ") + s", ${measures.find(_.name == "f_per").get.sql} AS MEASURE f_per"
    engine.sql(s"CREATE OR REPLACE VIEW fuzzg_v AS SELECT da, db, dc, $defs FROM fuzzg_base")

    val qDims = rnd.shuffle(Seq("da", "db", "dc")).take(2 + rnd.nextInt(2)).sorted
    val (wrapperSql, sets) = groupingSetsOf(rnd, qDims)
    val where = if (rnd.nextInt(3) == 0) Some(preds(rnd.nextInt(preds.size))) else None
    case class Call(m: Meas, mods: List[Mod], alias: String)
    val calls = (0 until 1 + rnd.nextInt(2)).map { i =>
      Call(measures(rnd.nextInt(measures.size)),
        List.fill(rnd.nextInt(3))(randomMod(rnd, qDims)), s"c$i")
    }
    val callSql = calls.map(c =>
      s"AGGREGATE(${c.m.name})${renderAtBlocks(rnd, c.mods)} AS ${c.alias}")
    val sql = s"SELECT ${(qDims ++ callSql).mkString(", ")} FROM fuzzg_v" +
      where.fold("")(p => s" WHERE ${p.sql}") +
      s" GROUP BY $wrapperSql"

    val got = rows(engine.sql(sql))

    val visibleRows = where.fold(data)(p => data.filter(p.p))
    val expected = sets.flatMap { s =>
      val combos = visibleRows.map(r => s.map(d => d -> dimVal(r, d)).toMap).distinct
      combos.map { c =>
        val g: Map[String, Any] = qDims.map(d => d -> c.getOrElse(d, null)).toMap
        val dimCells = qDims.map(d => cell(g(d)))
        val valCells = calls.map { cl =>
          val ctx = foldRef(cl.mods, paperDefault = false)
          // pins referencing a rolled-up outer dim evaluate to NULL and
          // match nothing (the YoY `db + 1` shift on a db-subtotal row)
          val pinNull = ctx.sets.exists(p =>
            p.valueSql.contains("+") && g("db") == null)
          if (pinNull) cell(null)
          else cell(expectedValue(data, where, qDims, g, cl.m, ctx))
        }
        dimCells ++ valCells
      }
    }.sortBy(_.mkString(""))

    assert(got == expected,
      s"\n[$caseId] DIVERGENCE\nsql: $sql\nwhere: ${where.map(_.sql)}\n" +
        s"sets: $sets\ncalls: ${calls.map(c => s"${c.m.name} mods=${c.mods}")}\n" +
        s"got:\n${got.map(_.mkString("\t")).mkString("\n")}\n" +
        s"expected:\n${expected.map(_.mkString("\t")).mkString("\n")}")
  }

  // ---------------------- axis 6: measure calls in HAVING (corpus
  // measures.test:3285 pins the base shape; this fuzzes the fold x
  // HAVING interaction: the HAVING call's context folds exactly like a
  // select-item call, the comparison filters groups with SQL
  // three-valued logic — a NULL measure value never passes).

  private def runHavingCase(rnd: Random, caseId: String): Unit = {
    val data = mkData(rnd, 30 + rnd.nextInt(50))
    val values = data.map(r => s"('${r.da}', ${r.db}, '${r.dc}', ${r.x}, ${r.y})").mkString(", ")
    engine.sql(s"CREATE OR REPLACE TEMPORARY VIEW fuzzh_base AS " +
      s"SELECT da, db, dc, CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y " +
      s"FROM VALUES $values AS t(da, db, dc, x, y)")
    val defs = measures.filterNot(m => derivedNames(m.name))
      .map(m => s"${m.sql} AS MEASURE ${m.name}")
      .mkString(", ") + s", ${measures.find(_.name == "f_per").get.sql} AS MEASURE f_per"
    engine.sql(s"CREATE OR REPLACE VIEW fuzzh_v AS SELECT da, db, dc, $defs FROM fuzzh_base")

    val qDims = rnd.shuffle(Seq("da", "db", "dc")).take(1 + rnd.nextInt(2)).sorted
    val where = if (rnd.nextInt(3) == 0) Some(preds(rnd.nextInt(preds.size))) else None
    val selM = measures(rnd.nextInt(measures.size))
    val selMods = List.fill(rnd.nextInt(3))(randomMod(rnd, qDims))
    val havM = measures(rnd.nextInt(measures.size))
    val havMods = List.fill(rnd.nextInt(3))(randomMod(rnd, qDims))
    val gt = rnd.nextBoolean()
    val t = Seq(2, 10, 50, 150, 400)(rnd.nextInt(5))
    val op = if (gt) ">" else "<="
    val sql = s"SELECT ${qDims.mkString(", ")}, " +
      s"AGGREGATE(${selM.name})${renderAtBlocks(rnd, selMods)} AS c0 FROM fuzzh_v" +
      where.fold("")(p => s" WHERE ${p.sql}") +
      s" GROUP BY ${qDims.mkString(", ")}" +
      s" HAVING AGGREGATE(${havM.name})${renderAtBlocks(rnd, havMods)} $op $t"

    val got = rows(engine.sql(sql))

    val visibleRows = where.fold(data)(p => data.filter(p.p))
    val groups = visibleRows.map(r => qDims.map(d => d -> dimVal(r, d)).toMap).distinct
    val selCtx = foldRef(selMods, paperDefault = false)
    val havCtx = foldRef(havMods, paperDefault = false)
    def num(a: Any): Option[Double] = a match {
      case null => None
      case d: Double => Some(d)
      case l: Long => Some(l.toDouble)
      case i: Int => Some(i.toDouble)
    }
    val expected = groups.flatMap { g =>
      val hv = num(expectedValue(data, where, qDims, g, havM, havCtx))
      val keep = hv.exists(v => if (gt) v > t else v <= t)
      if (!keep) None
      else Some(qDims.map(d => cell(g(d))) :+
        cell(expectedValue(data, where, qDims, g, selM, selCtx)))
    }.sortBy(_.mkString(""))

    assert(got == expected,
      s"\n[$caseId] DIVERGENCE\nsql: $sql\nwhere: ${where.map(_.sql)}\n" +
        s"sel=${selM.name} mods=$selMods hav=${havM.name} mods=$havMods\n" +
        s"got:\n${got.map(_.mkString("\t")).mkString("\n")}\n" +
        s"expected:\n${expected.map(_.mkString("\t")).mkString("\n")}")
  }

  // ------------------- axis 7: measure calls in ORDER BY (ordered compare)
  //
  // The ORDER BY call's context folds like a select item; the sort is by
  // its value. Rows are compared IN ORDER here (not set-compared): the
  // query sorts by the measure value with the dims as an explicit
  // deterministic tiebreak, and NULL ordering is pinned (NULLS FIRST).

  private def runOrderCase(rnd: Random, caseId: String): Unit = {
    val data = mkData(rnd, 30 + rnd.nextInt(50))
    val values = data.map(r => s"('${r.da}', ${r.db}, '${r.dc}', ${r.x}, ${r.y})").mkString(", ")
    engine.sql(s"CREATE OR REPLACE TEMPORARY VIEW fuzzo_base AS " +
      s"SELECT da, db, dc, CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y " +
      s"FROM VALUES $values AS t(da, db, dc, x, y)")
    val defs = measures.filterNot(m => derivedNames(m.name))
      .map(m => s"${m.sql} AS MEASURE ${m.name}")
      .mkString(", ") + s", ${measures.find(_.name == "f_per").get.sql} AS MEASURE f_per"
    engine.sql(s"CREATE OR REPLACE VIEW fuzzo_v AS SELECT da, db, dc, $defs FROM fuzzo_base")

    val qDims = rnd.shuffle(Seq("da", "db", "dc")).take(1 + rnd.nextInt(2)).sorted
    val where = if (rnd.nextInt(3) == 0) Some(preds(rnd.nextInt(preds.size))) else None
    val selM = measures(rnd.nextInt(measures.size))
    val ordM = measures(rnd.nextInt(measures.size))
    val ordMods = List.fill(rnd.nextInt(3))(randomMod(rnd, qDims))
    val desc = rnd.nextBoolean()
    val dir = if (desc) "DESC" else "ASC"
    val sql = s"SELECT ${qDims.mkString(", ")}, AGGREGATE(${selM.name}) AS c0 FROM fuzzo_v" +
      where.fold("")(p => s" WHERE ${p.sql}") +
      s" GROUP BY ${qDims.mkString(", ")}" +
      s" ORDER BY AGGREGATE(${ordM.name})${renderAtBlocks(rnd, ordMods)} $dir NULLS FIRST, " +
      qDims.mkString(", ")

    val got = engine.sql(sql).collect().toSeq.map(_.toSeq.map(cell))

    val visibleRows = where.fold(data)(p => data.filter(p.p))
    val groups = visibleRows.map(r => qDims.map(d => d -> dimVal(r, d)).toMap).distinct
    val selCtx = foldRef(Nil, paperDefault = false) // plain AGGREGATE = VISIBLE
    val ordCtx = foldRef(ordMods, paperDefault = false)
    def num(a: Any): Double = a match {
      case d: Double => d; case l: Long => l.toDouble; case i: Int => i.toDouble
    }
    val expected = groups.map { g =>
      val ov = expectedValue(data, where, qDims, g, ordM, ordCtx)
      val row = qDims.map(d => cell(g(d))) :+
        cell(expectedValue(data, where, qDims, g, selM, selCtx))
      (ov, g, row)
    }.sortBy { case (ov, g, _) =>
      // NULLS FIRST in both directions, then value (negated for DESC),
      // then the dim tiebreak
      val key = if (ov == null) Double.NegativeInfinity * (if (desc) -1 else 1)
                else num(ov)
      (if (desc) -key else key, qDims.map(d => cell(g(d))).mkString(" "))
    }.map(_._3)

    assert(got == expected,
      s"\n[$caseId] DIVERGENCE\nsql: $sql\nwhere: ${where.map(_.sql)}\n" +
        s"sel=${selM.name} ord=${ordM.name} mods=$ordMods desc=$desc\n" +
        s"got:\n${got.map(_.mkString("\t")).mkString("\n")}\n" +
        s"expected:\n${expected.map(_.mkString("\t")).mkString("\n")}")
  }

  test("differential fuzz: 100 ORDER-BY-measure queries match the evaluator") {
    val seed = 20260823
    val rnd = new Random(seed)
    var i = 0
    while (i < 100) {
      if (i % 20 == 0) rnd.setSeed(seed + i)
      runOrderCase(rnd, s"seed=$seed case=$i")
      i += 1
    }
  }

  test("differential fuzz: 100 HAVING-measure queries match the evaluator") {
    val seed = 20260821
    val rnd = new Random(seed)
    var i = 0
    while (i < 100) {
      if (i % 20 == 0) rnd.setSeed(seed + i)
      runHavingCase(rnd, s"seed=$seed case=$i")
      i += 1
    }
  }

  test("differential fuzz: 120 grouping-set queries match the evaluator") {
    val seed = 20260819
    val rnd = new Random(seed)
    var i = 0
    while (i < 120) {
      if (i % 20 == 0) rnd.setSeed(seed + i)
      runGsCase(rnd, s"seed=$seed case=$i")
      i += 1
    }
  }

  // ------- axis 8: subquery positions + set-operation branches (round-10
  // verdict task 7 — the last grammar corners with only example-level
  // coverage). Four shapes:
  //   0: <measure query> UNION [ALL] / INTERSECT / EXCEPT <measure query>
  //      — each branch folds its own AT chain independently; set-op
  //      semantics on the combined rows (DISTINCT variants treat NULLs as
  //      equal, SQL standard);
  //   1: non-measure SELECT ... WHERE dim IN (measure subquery with
  //      HAVING AGGREGATE(m) AT (...) <op> t);
  //   2: non-measure SELECT ... WHERE x > (scalar measure subquery) —
  //      a NULL scalar passes no rows (three-valued logic);
  //   3: non-measure SELECT ... WHERE EXISTS (grouped measure subquery
  //      with a HAVING measure filter) — non-correlated, all-or-nothing.
  // All four route through expandSubqueries (QueryExpander) or the set-op
  // branch splitter — neither shares code with the evaluator.

  private def runSubqCase(rnd: Random, caseId: String): Unit = {
    val data = mkData(rnd, 30 + rnd.nextInt(50))
    val values = data.map(r => s"('${r.da}', ${r.db}, '${r.dc}', ${r.x}, ${r.y})").mkString(", ")
    engine.sql(s"CREATE OR REPLACE TEMPORARY VIEW fuzz8_base AS " +
      s"SELECT da, db, dc, CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y " +
      s"FROM VALUES $values AS t(da, db, dc, x, y)")
    val defs = measures.filterNot(m => derivedNames(m.name))
      .map(m => s"${m.sql} AS MEASURE ${m.name}")
      .mkString(", ") + s", ${measures.find(_.name == "f_per").get.sql} AS MEASURE f_per"
    engine.sql(s"CREATE OR REPLACE VIEW fuzz8_v AS SELECT da, db, dc, $defs FROM fuzz8_base")

    val thresholds = Seq(2, 10, 50, 150, 400)
    def num(a: Any): Option[Double] = a match {
      case null => None
      case d: Double => Some(d)
      case l: Long => Some(l.toDouble)
      case i: Int => Some(i.toDouble)
    }

    rnd.nextInt(4) match {
      case 0 => // ---- set operation over two measure-query branches
        val op = Seq("UNION", "UNION ALL", "INTERSECT", "EXCEPT")(rnd.nextInt(4))
        val qDims = rnd.shuffle(Seq("da", "db", "dc")).take(1 + rnd.nextInt(2)).sorted
        def branch(): (String, Seq[Seq[String]]) = {
          val m = measures(rnd.nextInt(measures.size))
          val mods = List.fill(rnd.nextInt(3))(randomMod(rnd, qDims))
          val where = if (rnd.nextInt(3) == 0) Some(preds(rnd.nextInt(preds.size))) else None
          val sql = s"SELECT ${qDims.mkString(", ")}, " +
            s"AGGREGATE(${m.name})${renderAtBlocks(rnd, mods)} AS c0 FROM fuzz8_v" +
            where.fold("")(p => s" WHERE ${p.sql}") +
            s" GROUP BY ${qDims.mkString(", ")}"
          val visibleRows = where.fold(data)(p => data.filter(p.p))
          val groups = visibleRows.map(r => qDims.map(d => d -> dimVal(r, d)).toMap).distinct
          val ctx = foldRef(mods, paperDefault = false)
          val exp = groups.map(g => qDims.map(d => cell(g(d))) :+
            cell(expectedValue(data, where, qDims, g, m, ctx)))
          (sql, exp)
        }
        val (sqlA, expA) = branch()
        val (sqlB, expB) = branch()
        val got = rows(engine.sql(s"$sqlA $op $sqlB"))
        val bSet = expB.toSet
        val expected = (op match {
          case "UNION ALL" => expA ++ expB
          case "UNION" => (expA ++ expB).distinct
          case "INTERSECT" => expA.distinct.filter(bSet)
          case "EXCEPT" => expA.distinct.filterNot(bSet)
        }).sortBy(_.mkString(""))
        assert(got == expected,
          s"\n[$caseId] SETOP DIVERGENCE\nsql: $sqlA $op $sqlB\n" +
            s"got:\n${got.map(_.mkString("\t")).mkString("\n")}\n" +
            s"expected:\n${expected.map(_.mkString("\t")).mkString("\n")}")

      case 1 => // ---- dim IN (measure subquery filtered by HAVING)
        val d = Seq("da", "db", "dc")(rnd.nextInt(3))
        val m = measures(rnd.nextInt(measures.size))
        val mods = List.fill(rnd.nextInt(3))(randomMod(rnd, Seq(d)))
        val t = thresholds(rnd.nextInt(thresholds.size))
        val gt = rnd.nextBoolean()
        val op = if (gt) ">" else "<="
        val sql = s"SELECT da, db, dc, x FROM fuzz8_base WHERE $d IN " +
          s"(SELECT $d FROM fuzz8_v GROUP BY $d " +
          s"HAVING AGGREGATE(${m.name})${renderAtBlocks(rnd, mods)} $op $t)"
        val got = rows(engine.sql(sql))
        val ctx = foldRef(mods, paperDefault = false)
        val passing = data.map(r => dimVal(r, d)).distinct.filter { v =>
          num(expectedValue(data, None, Seq(d), Map(d -> v), m, ctx))
            .exists(x => if (gt) x > t else x <= t)
        }.toSet
        val expected = data.filter(r => passing(dimVal(r, d)))
          .map(r => Seq(r.da, r.db.toString, r.dc, cell(r.x)))
          .sortBy(_.mkString(""))
        assert(got == expected,
          s"\n[$caseId] IN DIVERGENCE\nsql: $sql\nm=${m.name} mods=$mods\n" +
            s"got:\n${got.map(_.mkString("\t")).mkString("\n")}\n" +
            s"expected:\n${expected.map(_.mkString("\t")).mkString("\n")}")

      case 2 => // ---- scalar measure subquery in a row-level comparison
        val m = measures(rnd.nextInt(measures.size))
        // dims = Seq("da") keeps randomMod away from the outer-dim SET
        // shift (no outer dims exist in a scalar subquery)
        val mods = List.fill(rnd.nextInt(3))(randomMod(rnd, Seq("da")))
        val sql = s"SELECT da, db, x FROM fuzz8_base WHERE x > " +
          s"(SELECT AGGREGATE(${m.name})${renderAtBlocks(rnd, mods)} FROM fuzz8_v)"
        val got = rows(engine.sql(sql))
        val ctx = foldRef(mods, paperDefault = false)
        val scalar = num(expectedValue(data, None, Nil, Map.empty, m, ctx))
        val expected = scalar.fold(Seq.empty[Seq[String]])(s =>
          data.filter(_.x > s).map(r => Seq(r.da, r.db.toString, cell(r.x))))
          .sortBy(_.mkString(""))
        assert(got == expected,
          s"\n[$caseId] SCALAR DIVERGENCE\nsql: $sql\nm=${m.name} mods=$mods scalar=$scalar\n" +
            s"got:\n${got.map(_.mkString("\t")).mkString("\n")}\n" +
            s"expected:\n${expected.map(_.mkString("\t")).mkString("\n")}")

      case _ => // ---- non-correlated EXISTS over a HAVING-filtered measure query
        val d = Seq("da", "db", "dc")(rnd.nextInt(3))
        val m = measures(rnd.nextInt(measures.size))
        val mods = List.fill(rnd.nextInt(3))(randomMod(rnd, Seq(d)))
        val t = thresholds(rnd.nextInt(thresholds.size))
        val neg = rnd.nextBoolean()
        val ex = if (neg) "NOT EXISTS" else "EXISTS"
        val sql = s"SELECT da, x FROM fuzz8_base WHERE $ex " +
          s"(SELECT $d FROM fuzz8_v GROUP BY $d " +
          s"HAVING AGGREGATE(${m.name})${renderAtBlocks(rnd, mods)} > $t)"
        val got = rows(engine.sql(sql))
        val ctx = foldRef(mods, paperDefault = false)
        val any = data.map(r => dimVal(r, d)).distinct.exists { v =>
          num(expectedValue(data, None, Seq(d), Map(d -> v), m, ctx)).exists(_ > t)
        }
        val expected = (if (any != neg) data.map(r => Seq(r.da, cell(r.x)))
                        else Seq.empty[Seq[String]]).sortBy(_.mkString(""))
        assert(got == expected,
          s"\n[$caseId] EXISTS DIVERGENCE\nsql: $sql\nm=${m.name} mods=$mods any=$any\n" +
            s"got:\n${got.map(_.mkString("\t")).mkString("\n")}\n" +
            s"expected:\n${expected.map(_.mkString("\t")).mkString("\n")}")
    }
  }

  test("differential fuzz: 100 subquery/set-operation measure queries match the evaluator") {
    val seed = 20260825
    val rnd = new Random(seed)
    var i = 0
    while (i < 100) {
      if (i % 20 == 0) rnd.setSeed(seed + i)
      runSubqCase(rnd, s"seed=$seed case=$i")
      i += 1
    }
  }

  // ------- axis 9: measure VIEWS over set-operation BASES (round-11
  // verdict task 5). The view body is `branchA <op> branchB`; per
  // measures.rs:2645-2650 the base relation is the whole set-op OUTPUT, so
  // the evaluator models the union/intersect/except row multiset in Scala
  // and feeds it to the same row-level fold evaluator as axis 1. Branch
  // projections must carry the raw columns (x, y) — measures aggregate
  // over the set-op output, not any branch's FROM.

  private def runSetOpBaseCase(rnd: Random, caseId: String): Unit = {
    val dataA = mkData(rnd, 20 + rnd.nextInt(30))
    val dataB = mkData(rnd, 20 + rnd.nextInt(30))
    def reg(name: String, data: Seq[R]): Unit = {
      val values = data.map(r => s"('${r.da}', ${r.db}, '${r.dc}', ${r.x}, ${r.y})").mkString(", ")
      engine.sql(s"CREATE OR REPLACE TEMPORARY VIEW $name AS " +
        s"SELECT da, db, dc, CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y " +
        s"FROM VALUES $values AS t(da, db, dc, x, y)")
    }
    reg("fuzz9_a", dataA); reg("fuzz9_b", dataB)

    val predA = if (rnd.nextInt(2) == 0) Some(preds(rnd.nextInt(preds.size))) else None
    val predB = if (rnd.nextInt(3) == 0) Some(preds(rnd.nextInt(preds.size))) else None
    val op = Seq("UNION ALL", "UNION ALL", "UNION", "INTERSECT", "EXCEPT")(rnd.nextInt(5))
    // a third branch in ~1/4 of cases, ANY op: the model below is
    // precedence-aware (SQL binds INTERSECT tighter than UNION/EXCEPT, so
    // `A op B INTERSECT C` groups as `A op (B INTERSECT C)`; every other
    // pair is left-associative at equal precedence). The ENGINE needs no
    // special handling — it wraps the whole body and Spark re-parses the
    // same precedence — this exercises exactly that invariant.
    val op2 = if (rnd.nextInt(4) == 0)
      Some(Seq("UNION ALL", "UNION", "EXCEPT", "INTERSECT")(rnd.nextInt(4))) else None
    val dataC = op2.map(_ => mkData(rnd, 10 + rnd.nextInt(20)))
    dataC.foreach(reg("fuzz9_c", _))
    val predC = if (rnd.nextInt(3) == 0) Some(preds(rnd.nextInt(preds.size))) else None

    val nonDerived = measures.filterNot(m => derivedNames(m.name))
    val declList = nonDerived.map(m => (m.name, s"${m.sql} AS MEASURE ${m.name}")) :+
      ("f_per", (s"${measures.find(_.name == "f_per").get.sql} AS MEASURE f_per"))
    // occasionally declare the measures in the SECOND branch (the reference
    // replaces AS MEASURE slots in every branch; first decl of a name wins)
    val declInSecond = rnd.nextInt(5) == 0
    val (itemsA, itemsB) =
      if (declInSecond) (declList.map { case (n, _) => s"NULL AS $n" }, declList.map(_._2))
      else (declList.map(_._2), declList.map(_ => "NULL"))

    // model the base multiset with SQL set-op semantics (DISTINCT variants
    // compare full rows; the NULL measure slots are equal on both sides),
    // with SQL precedence: a second op of INTERSECT binds tighter, so
    // `A op (B INTERSECT C)`; otherwise fold left-to-right (a FIRST op of
    // INTERSECT is leftmost anyway, so left-to-right already groups it)
    def fold1(acc: Seq[R], o: String, rhs: Seq[R]): Seq[R] = o match {
      case "UNION ALL" => acc ++ rhs
      case "UNION" => (acc ++ rhs).distinct
      case "INTERSECT" => val s = rhs.toSet; acc.distinct.filter(s)
      case "EXCEPT" => val s = rhs.toSet; acc.distinct.filterNot(s)
    }
    val rowsA = predA.fold(dataA)(p => dataA.filter(p.p))
    val rowsB = predB.fold(dataB)(p => dataB.filter(p.p))
    val rowsC = dataC.map(dc => predC.fold(dc)(p => dc.filter(p.p)))
    val preTail: Seq[R] = (op2, rowsC) match {
      case (Some("INTERSECT"), Some(rc)) => fold1(rowsA, op, fold1(rowsB, "INTERSECT", rc))
      case (Some(o2), Some(rc)) => fold1(fold1(rowsA, op, rowsB), o2, rc)
      case _ => fold1(rowsA, op, rowsB)
    }

    // r12 variants (verdict task 4): branch-level parens (semantics-
    // preserving — operand parens don't change operator precedence) and a
    // whole-set-op trailing ORDER BY … LIMIT (binds to the whole chain; the
    // deterministic full-row sort key makes the cut multiset unique)
    val parenWrap = rnd.nextInt(3) == 0
    val tailLim =
      if (rnd.nextInt(4) == 0 && preTail.nonEmpty) Some(1 + rnd.nextInt(preTail.size)) else None
    val tailSql = tailLim.fold("")(k => s" ORDER BY da, db, dc, x, y LIMIT $k")
    val base: Seq[R] =
      tailLim.fold(preTail)(k => preTail.sortBy(r => (r.da, r.db, r.dc, r.x, r.y)).take(k))

    def wrap(sel: String): String = if (parenWrap) s"($sel)" else sel
    val bA = wrap(s"SELECT da, db, dc, x, y, ${itemsA.mkString(", ")} FROM fuzz9_a" +
      predA.fold("")(p => s" WHERE ${p.sql}"))
    val bB = wrap(s"SELECT da, db, dc, x, y, ${itemsB.mkString(", ")} FROM fuzz9_b" +
      predB.fold("")(p => s" WHERE ${p.sql}"))
    val bC = op2.map(o2 =>
      s" $o2 " + wrap(s"SELECT da, db, dc, x, y, ${declList.map(_ => "NULL").mkString(", ")} FROM fuzz9_c" +
        predC.fold("")(p => s" WHERE ${p.sql}"))).getOrElse("")
    engine.sql(s"CREATE OR REPLACE VIEW fuzz9_v AS $bA $op $bB$bC$tailSql")

    val qDims = rnd.shuffle(Seq("da", "db", "dc")).take(1 + rnd.nextInt(2)).sorted
    val where = if (rnd.nextInt(3) == 0) Some(preds(rnd.nextInt(preds.size))) else None
    val nCalls = 1 + rnd.nextInt(2)
    case class Call(m: Meas, mods: List[Mod], bare: Boolean, alias: String)
    val calls = (0 until nCalls).map { i =>
      val m = measures(rnd.nextInt(measures.size))
      val bare = rnd.nextInt(6) == 0
      val mods = if (bare) Nil else List.fill(rnd.nextInt(3))(randomMod(rnd, qDims))
      Call(m, mods, bare, s"c$i")
    }
    def renderCall(c: Call): String =
      if (c.bare) s"${c.m.name} AS ${c.alias}"
      else s"AGGREGATE(${c.m.name})${renderAtBlocks(rnd, c.mods)} AS ${c.alias}"
    val sql = s"SELECT ${(qDims ++ calls.map(renderCall)).mkString(", ")} FROM fuzz9_v" +
      where.fold("")(p => s" WHERE ${p.sql}") +
      s" GROUP BY ${qDims.mkString(", ")}"
    val got = rows(engine.sql(sql))

    val visibleRows = where.fold(base)(p => base.filter(p.p))
    val groups = visibleRows.map(r => qDims.map(d => d -> dimVal(r, d)).toMap).distinct
    val expected = groups.map { g =>
      val dimCells = qDims.map(d => cell(g(d)))
      val valCells = calls.map { c =>
        val ctx = foldRef(c.mods, paperDefault = c.bare)
        cell(expectedValue(base, where, qDims, g, c.m, ctx))
      }
      dimCells ++ valCells
    }.sortBy(_.mkString(""))

    if (got != expected) {
      val slots = declList.map { case (n, _) => s"NULL AS $n" }.mkString(", ")
      val bA5 = s"SELECT da, db, dc, x, y, $slots FROM fuzz9_a" + predA.fold("")(p => s" WHERE ${p.sql}")
      val bB5 = s"SELECT da, db, dc, x, y, $slots FROM fuzz9_b" + predB.fold("")(p => s" WHERE ${p.sql}")
      val bC5 = op2.map(o2 => s" $o2 SELECT da, db, dc, x, y, $slots FROM fuzz9_c" +
        predC.fold("")(p => s" WHERE ${p.sql}")).getOrElse("")
      val engBase = rows(engine.sql(s"SELECT da, db, dc, x, y FROM ( $bA5 $op $bB5$bC5$tailSql ) s"))
      val modelBase = base.map(r => Seq(r.da, r.db.toString, r.dc, cell(r.x), cell(r.y)))
        .sortBy(_.mkString("\t"))
      val diffRow = (engBase.toSet -- modelBase.toSet) ++ (modelBase.toSet -- engBase.toSet)
      val probe = diffRow.headOption.map { r =>
        val cond = s"da='${r(0)}' AND db=${r(1)} AND dc='${r(2)}' AND x=${r(3)} AND y=${r(4)}"
        val ca = rows(engine.sql(s"SELECT COUNT(*) FROM fuzz9_a WHERE $cond")).head.head
        val cb = rows(engine.sql(s"SELECT COUNT(*) FROM fuzz9_b WHERE $cond")).head.head
        val ma = dataA.count(d => Seq(d.da, d.db.toString, d.dc, cell(d.x), cell(d.y)) == r)
        val mb = dataB.count(d => Seq(d.da, d.db.toString, d.dc, cell(d.x), cell(d.y)) == r)
        s"diffRow=$r sqlA=$ca sqlB=$cb modelA=$ma modelB=$mb"
      }.getOrElse("no row diff") +
        s"\nvaluesA: ${dataA.map(r => s"('${r.da}', ${r.db}, '${r.dc}', ${r.x}, ${r.y})").mkString(", ")}" +
        s"\nvaluesB: ${dataB.map(r => s"('${r.da}', ${r.db}, '${r.dc}', ${r.x}, ${r.y})").mkString(", ")}"
      fail(
        s"\n[$caseId] SETOP-BASE DIVERGENCE\nview: $bA $op $bB$bC\nsql: $sql\nprobe: $probe\n" +
          s"calls: ${calls.map(c => s"${c.m.name} bare=${c.bare} mods=${c.mods}")}\n" +
          s"got:\n${got.map(_.mkString("\t")).mkString("\n")}\n" +
          s"expected:\n${expected.map(_.mkString("\t")).mkString("\n")}\n" +
          s"engineBase (${engBase.size}):\n${engBase.map(_.mkString("\t")).mkString("\n")}\n" +
          s"modelBase (${modelBase.size}):\n${modelBase.map(_.mkString("\t")).mkString("\n")}\n" +
          s"expanded:\n${engine.expandSql(sql)}")
    }
  }

  test("differential fuzz: 100 set-op-base measure views match the evaluator") {
    val seed = 20260911
    val rnd = new Random(seed)
    var i = 0
    while (i < 100) {
      if (i % 20 == 0) rnd.setSeed(seed + i)
      runSetOpBaseCase(rnd, s"seed=$seed case=$i")
      i += 1
    }
  }
}
