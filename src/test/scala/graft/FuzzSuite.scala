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
}
