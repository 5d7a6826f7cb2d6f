package graft.planner

import graft.syntax.{ContextModifier, Scan}
import ContextModifier._

/** How the evaluation context filters base rows. */
sealed trait CtxFilter
object CtxFilter {
  /** No filter at all (AT (ALL dim) etc. ignore the outer WHERE). */
  case object NoFilter extends CtxFilter
  /** Apply the outer query's WHERE (VISIBLE / default AGGREGATE()). */
  case object VisibleFilter extends CtxFilter
  /** Apply a custom condition (AT (WHERE cond)). */
  final case class CondFilter(cond: String) extends CtxFilter
}

/** The folded evaluation context for one AGGREGATE call.
  *
  * @param grand              no correlation, no filter — aggregate the whole base
  * @param removedDims        dim specs removed from correlation (`ALL dim`,
  *                           plus the SET dim in the single-modifier path)
  * @param dropAllCorrelation single `AT (WHERE)` drops every correlation
  * @param sets               (dimSpec, valueExpr) join conditions
  * @param filter             base-row filter
  *
  * Semantics are a faithful re-specification of the reference fold
  * (/root/reference/yardstick-rs/src/sql/measures.rs:5942-6176 multi-modifier,
  * :5791-5937 single-modifier), including its path-dependent quirks:
  * the single-modifier SET removes its dim from correlation while the
  * multi-modifier fold does not; modifiers are applied right-to-left; a SET
  * anywhere suppresses VISIBLE; ALL (global) clears SET/WHERE effects seen
  * to its right and suppresses those to its left.
  */
final case class EvalCtx(
    grand: Boolean,
    removedDims: List[String],
    dropAllCorrelation: Boolean,
    sets: List[(String, String)],
    filter: CtxFilter
)

object ContextFold {
  import CtxFilter._

  /** True when `dimSpec` (an ALL/SET operand) refers to dimension column
    * text `col`. Expression dims compare by normalized full text; simple
    * names by the last qualified part, case-insensitively.
    * (Reference: the filter closures at measures.rs:5654-5663, 6128-6141.)
    */
  def dimMatches(dimSpec: String, col: String): Boolean = {
    val isExpr = dimSpec.contains('(')
    if (isExpr) Scan.norm(dimSpec) == Scan.norm(col)
    else {
      val d = dimSpec.toLowerCase
      Scan.lastPart(col).toLowerCase == Scan.lastPart(d) ||
      Scan.norm(col) == Scan.norm(d)
    }
  }

  def fold(modifiers: List[ContextModifier], paperDefault: Boolean): EvalCtx = {
    if (modifiers.isEmpty) {
      // bare-`m` implicit refs use the paper default context: correlate on
      // group dims, ignore the outer WHERE (measures.rs:5193-5217); explicit
      // AGGREGATE(m) defaults to VISIBLE
      return EvalCtx(grand = false, Nil, dropAllCorrelation = false, Nil,
        if (paperDefault) NoFilter else VisibleFilter)
    }
    if (modifiers.length == 1) {
      return modifiers.head match {
        case AllGlobal => EvalCtx(grand = true, Nil, dropAllCorrelation = false, Nil, NoFilter)
        case All(d) => EvalCtx(grand = false, List(d), dropAllCorrelation = false, Nil, NoFilter)
        case SetMod(d, e) =>
          // single-modifier SET removes its dim from correlation (measures.rs:5884-5900)
          EvalCtx(grand = false, List(d), dropAllCorrelation = false, List((d, e)), NoFilter)
        case WhereMod(c) =>
          EvalCtx(grand = false, Nil, dropAllCorrelation = true, Nil, CondFilter(c))
        case Visible => EvalCtx(grand = false, Nil, dropAllCorrelation = false, Nil, VisibleFilter)
      }
    }

    // all modifiers are ALL variants (measures.rs:5976-6044)
    val allAreAll = modifiers.forall {
      case AllGlobal | All(_) => true
      case _ => false
    }
    if (allAreAll) {
      if (modifiers.contains(AllGlobal))
        return EvalCtx(grand = true, Nil, dropAllCorrelation = false, Nil, NoFilter)
      val removed = modifiers.collect { case All(d) => d }
      return EvalCtx(grand = false, removed, dropAllCorrelation = false, Nil, NoFilter)
    }

    // general fold, right-to-left (measures.rs:6046-6119)
    val hasSet = modifiers.exists(_.isInstanceOf[SetMod])
    var filter: CtxFilter = NoFilter
    var hasAllGlobal = false
    val sets = scala.collection.mutable.ListBuffer[(String, String)]()
    val removed = scala.collection.mutable.ListBuffer[String]()

    for (m <- modifiers.reverse) m match {
      case AllGlobal =>
        hasAllGlobal = true
        filter = NoFilter
        sets.clear()
      case All(d) =>
        removed += d
      case Visible =>
        if (!hasSet && !hasAllGlobal) filter = VisibleFilter
      case WhereMod(c) =>
        if (!hasAllGlobal) filter = CondFilter(c)
      case SetMod(d, e) =>
        if (!hasAllGlobal && !removed.exists(r => dimMatches(r, d) || dimMatches(d, r)))
          sets += ((d, e))
    }

    if (hasAllGlobal && sets.isEmpty)
      EvalCtx(grand = true, Nil, dropAllCorrelation = false, Nil, NoFilter)
    else
      EvalCtx(grand = false, removed.toList, dropAllCorrelation = false,
        sets.toList, filter)
  }

  /** Resolve `CURRENT dim` / `CURRENT(dim)` references in a SET value
    * expression. `CURRENT dim` resolves to the dim ref when the dim is part
    * of the outer context (grouped), else to a constant the outer WHERE pins
    * it to (`dim = const`), else to NULL.
    * (Reference: resolve_current_in_expr, measures.rs:3524-3619;
    * current_dimension_is_single_valued :3508-3522.)
    */
  def resolveCurrent(expr: String, groupDims: Seq[String], outerWhere: Option[String]): String = {
    val re = "(?i)\\bCURRENT\\b".r
    val mask = Scan.buildMask(expr)
    val sb = new StringBuilder
    var pos = 0
    for (m <- re.findAllMatchIn(expr) if !mask(m.start)) {
      if (m.start >= pos) {
        sb.append(expr.substring(pos, m.start))
        var i = m.end
        while (i < expr.length && expr.charAt(i).isWhitespace) i += 1
        // CURRENT(dim) form
        var dim: String = null
        var next = i
        if (i < expr.length && expr.charAt(i) == '(') {
          val close = Scan.matchParen(expr, mask, i)
          if (close > 0) { dim = expr.substring(i + 1, close).trim; next = close + 1 }
        } else if (i < expr.length && (expr.charAt(i).isLetter || expr.charAt(i) == '_')) {
          var j = i
          while (j < expr.length && Scan.isIdentChar(expr.charAt(j))) j += 1
          dim = expr.substring(i, j); next = j
        }
        if (dim == null) { sb.append(expr.substring(m.start, m.end)); pos = m.end }
        else {
          val resolved =
            if (groupDims.exists(g => dimMatches(dim, g))) dim
            else pinnedConstant(dim, outerWhere).getOrElse("NULL")
          sb.append(resolved)
          pos = next
        }
      }
    }
    sb.append(expr.substring(pos))
    sb.toString
  }

  /** `WHERE ... dim = <const> ...` (top-level AND conjuncts only) pins dim to
    * const. (Reference: where_has_simple_equality_constraint, measures.rs:3455.)
    */
  def pinnedConstant(dim: String, outerWhere: Option[String]): Option[String] = {
    outerWhere.flatMap { w =>
      val mask = Scan.buildMask(w)
      val conjuncts = splitAnd(w, mask)
      conjuncts.iterator.flatMap { c =>
        val eq = c.indexOf('=')
        if (eq > 0 && (eq + 1 >= c.length || c.charAt(eq + 1) != '=') &&
            (eq == 0 || (c.charAt(eq - 1) != '!' && c.charAt(eq - 1) != '<' && c.charAt(eq - 1) != '>'))) {
          val lhs = c.substring(0, eq).trim
          val rhs = c.substring(eq + 1).trim
          if (Scan.lastPart(lhs).equalsIgnoreCase(Scan.lastPart(dim)) &&
              lhs.forall(ch => Scan.isIdentChar(ch) || ch == '.'))
            Some(rhs)
          else None
        } else None
      }.toSeq.headOption
    }
  }

  private def splitAnd(w: String, mask: Array[Boolean]): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var start = 0
    var i = 0
    while (i < w.length) {
      if (!mask(i) && (i == 0 || !Scan.isIdentChar(w.charAt(i - 1))) &&
          w.regionMatches(true, i, "AND", 0, 3) &&
          (i + 3 >= w.length || !Scan.isIdentChar(w.charAt(i + 3)))) {
        out += w.substring(start, i).trim
        start = i + 3
        i += 3
      } else i += 1
    }
    out += w.substring(start).trim
    out.toList
  }
}
