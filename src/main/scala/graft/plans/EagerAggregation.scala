package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.DecimalType

/** Eager aggregation (group-by pushdown through joins; Yan & Larson,
  * VLDB '95) — the classic optimization Spark's Catalyst does not perform.
  *
  * `Aggregate(G, SUM/COUNT(x), A ⋈ B)` where the aggregated inputs come
  * from one join side and the grouping keys from the other is rewritten to
  * pre-aggregate that side by its join keys BEFORE the join:
  * `Aggregate(G, SUM(psum), Aggregate(keys, partials, A) ⋈ B)`. Correct for
  * inner equi-joins because per-key multiplicity is preserved: each of the
  * M matching B-rows sees the one pre-aggregated A-row, so the outer
  * re-aggregate scales partials by exactly the original join fan-out.
  *
  * At 100 TB this is the difference between shuffling 60M fact rows into
  * the join and shuffling 15M pre-aggregated keys — a 4× shuffle-volume
  * cut on the measured shape. On local[32] (where shuffle is cheap) the
  * wall-clock effect ranges from neutral (5.9 vs 6.1 s, quiet machine) to
  * 2.2× (4.3 vs 9.6 s, contended window where the extra shuffled bytes
  * hurt) on the 100x single-fact-join shape; the shuffle-byte reduction
  * itself is unconditional and is what pays on a real cluster.
  *
  * Safety gates (each measured, not assumed):
  *  - inner/left/right equi-joins only, every conjunct a column=column
  *    equality. Outer joins (Yan & Larson's outer cases) add two gates:
  *    pushing the null-supplying side requires every aggregate input to be
  *    NULL on a null-extended row (attribute or null-intolerant tree —
  *    blocks COUNT(*) and COALESCE-style inputs); pushing the preserved
  *    side needs nothing extra (unmatched keys collapse M null-extended
  *    rows into one pre-aggregated row in the same all-NULL group);
  *  - LEAF-side pushes only — the target subtree must contain no Join.
  *    Pushing into a join-bearing subtree merely re-aggregates that join's
  *    output (measured +25% on a 3-join tree) since nothing upstream
  *    shrinks;
  *  - every aggregate call is a non-DISTINCT, non-FILTER SUM or COUNT whose
  *    inputs live entirely on the pushed side (non-decimal: double summing
  *    would widen decimal precision differently than a single pass);
  *  - grouping keys live entirely on the other side, and there IS a group
  *    (global aggregates keep COUNT()=0-on-empty semantics untouched);
  *  - the pushed side must be estimated larger than `graft.eagerAgg.minBytes`
  *    (default 32 MB) — below that the extra hash aggregate costs more than
  *    the join it shrinks, and the bench floor at small SF stays intact.
  */
object EagerAggregation extends Rule[LogicalPlan] with PredicateHelper {

  val confKey = "graft.eagerAgg.minBytes"
  private def minBytes: Long =
    SQLConf.get.getConfString(confKey, (32L * 1024 * 1024).toString).toLong

  def apply(plan: LogicalPlan): LogicalPlan = {
    // streaming plans are incrementalized AFTER this rule would run, and the
    // UnsupportedOperationChecker validated the ORIGINAL shape — injecting a
    // stateful pre-aggregate under a stream-static join is not sound
    if (plan.isStreaming) return plan
    plan.transform {
      // the rule runs after column pruning, which leaves a pure-attribute
      // Project between the Aggregate and the Join — see through it (the
      // aggregate's expressions reference the join's attributes either way,
      // and the rewritten sides re-derive their own pruning)
      case agg @ Aggregate(grouping, aggExprs, PlanWithJoin(join), _)
          if (join.joinType == Inner || join.joinType == LeftOuter ||
              join.joinType == RightOuter) &&
            join.condition.isDefined && grouping.nonEmpty =>
        val conjuncts = splitConjunctivePredicates(join.condition.get)
        rewrite(grouping, aggExprs, join, conjuncts, pushLeft = true)
          .orElse(rewrite(grouping, aggExprs, join, conjuncts, pushLeft = false))
          .map { case (newAggExprs, newJoin) =>
            // copy() keeps the Aggregate's hint and any future fields
            agg.copy(aggregateExpressions = newAggExprs, child = newJoin)
          }
          .getOrElse(agg)
    }
  }

  private object PlanWithJoin {
    def unapply(plan: LogicalPlan): Option[Join] = plan match {
      case j: Join => Some(j)
      case Project(projList, j: Join)
          if projList.forall(_.isInstanceOf[AttributeReference]) => Some(j)
      case _ => None
    }
  }

  private def rewrite(grouping: Seq[Expression], aggExprs: Seq[NamedExpression],
                      join: Join, conjuncts: Seq[Expression],
                      pushLeft: Boolean): Option[(Seq[NamedExpression], Join)] = {
    val (target, other) = if (pushLeft) (join.left, join.right) else (join.right, join.left)
    // Outer-join gates (Yan & Larson's outer-join cases). Pushing the
    // PRESERVED side is safe with the inner-join gates: unmatched target
    // keys collapse from M null-extended rows to one pre-aggregated row,
    // but all those rows carry identical (all-NULL) grouping keys and the
    // partials preserve the group totals. Pushing the NULL-SUPPLYING side
    // is safe only when every aggregate reads a real column of that side:
    // an unmatched preserved row then contributes a NULL partial, which
    // SUM skips exactly as it skipped the null-extended inputs — but a
    // reference-free COUNT(*)/COUNT(1) counts preserved rows themselves
    // and would be undercounted, so it blocks the push.
    val nullSupplying = (join.joinType == LeftOuter && !pushLeft) ||
      (join.joinType == RightOuter && pushLeft)
    if (target.isInstanceOf[Aggregate]) return None // one push per side
    // leaf-side pushes only (no Join inside the target subtree): measured at
    // 100x, pre-aggregating a scan side by its join key wins 2.2x (9.6 s ->
    // 4.3 s on the 60M x 15M fact join), while pushing into a join-bearing
    // subtree just re-aggregates that join's output — pure overhead (+25%
    // on the 3-join q_join_agg shape) because it shrinks nothing upstream
    if (target.collectFirst { case j: Join => j }.isDefined) return None
    if (grouping.exists(g => !g.references.subsetOf(other.outputSet))) return None

    // every join conjunct must be target-col = other-col; collect target keys
    val keys = mutable.LinkedHashSet[Attribute]()
    conjuncts.foreach {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if target.outputSet.contains(a) && other.outputSet.contains(b) => keys += a
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if target.outputSet.contains(b) && other.outputSet.contains(a) => keys += b
      case _ => return None
    }

    val aggCalls = aggExprs.flatMap(_.collect { case ae: AggregateExpression => ae })
    if (aggCalls.isEmpty) return None
    // Null-supplying pushes additionally require the aggregate input to
    // evaluate to NULL on a null-extended row (all target columns NULL):
    // the pre-aggregate replaces "evaluate the input over null-extended
    // columns" with a NULL partial, and SUM/COUNT skip both the same way
    // ONLY if the input was null too. An attribute is null on the row; a
    // null-intolerant expression is null if any child is; anything else
    // (COALESCE, IS NULL, CASE, literals) could produce a value from
    // nulls and blocks the push.
    def nullOnNullRow(e: Expression): Boolean = e match {
      case _: AttributeReference => true
      case _ if e.nullIntolerant => e.children.exists(nullOnNullRow)
      case _ => false
    }
    def pushable(ae: AggregateExpression): Boolean =
      ae.filter.isEmpty && !ae.isDistinct &&
        !ae.dataType.isInstanceOf[DecimalType] &&
        (!nullSupplying || ae.aggregateFunction.children.exists(nullOnNullRow)) &&
        (ae.aggregateFunction match {
          case Sum(c, _) => c.references.subsetOf(target.outputSet)
          case c: Count => c.references.subsetOf(target.outputSet)
          // MIN/MAX are duplicate-insensitive: the join fan-out that SUM
          // compensates for via re-summing partials is simply invisible
          case Min(c) => c.references.subsetOf(target.outputSet)
          case Max(c) => c.references.subsetOf(target.outputSet)
          // AVG decomposes to pushed SUM+COUNT. Restricted to float/double
          // inputs: there Average's own buffer already accumulates a double
          // sum, so the rewrite performs the SAME arithmetic (modulo the
          // regroup ordering every partial aggregate has); for integral
          // inputs our exact long partial would differ from Average's
          // double accumulation by ULPs and break plan-invariance
          case Average(c, _) =>
            (c.dataType == org.apache.spark.sql.types.DoubleType ||
              c.dataType == org.apache.spark.sql.types.FloatType) &&
              c.references.subsetOf(target.outputSet)
          case _ => false
        })
    if (!aggCalls.forall(pushable)) return None

    // size gate LAST (stats can be the expensive part of matching); BigInt
    // compare — join-free scan estimates are sane, but never trust a Long
    if (target.stats.sizeInBytes < BigInt(minBytes)) return None

    val partials = mutable.LinkedHashMap[Expression, Alias]()
    // AVG needs a SECOND partial (the non-null count) next to its sum
    val avgCounts = mutable.LinkedHashMap[Expression, Alias]()
    for (ae <- aggCalls if !partials.contains(ae.canonicalized))
      ae.aggregateFunction match {
        case Average(c, _) =>
          partials(ae.canonicalized) =
            Alias(AggregateExpression(Sum(c), Complete, isDistinct = false), "__graft_partial")()
          avgCounts(ae.canonicalized) =
            Alias(AggregateExpression(Count(Seq(c)), Complete, isDistinct = false), "__graft_partial")()
        case _ =>
          partials(ae.canonicalized) =
            Alias(AggregateExpression(ae.aggregateFunction, Complete, isDistinct = false),
              "__graft_partial")()
      }

    val preAgg = Aggregate(keys.toSeq, keys.toSeq ++ partials.values ++ avgCounts.values, target)
    val newJoin = if (pushLeft) join.copy(left = preAgg) else join.copy(right = preAgg)
    val newAggExprs = aggExprs.map(_.transform {
      case ae: AggregateExpression if partials.contains(ae.canonicalized) =>
        val summed = AggregateExpression(
          Sum(partials(ae.canonicalized).toAttribute), Complete, isDistinct = false)
        ae.aggregateFunction match {
          // COUNT is non-nullable; a bare Sum rewrite would flip the result
          // column nullable, making the schema depend on whether the stats
          // gate fired. With a grouping present the group is never empty, so
          // the coalesce only restores the nullability contract.
          case _: Count => Coalesce(Seq(summed, Literal(0L)))
          case _: Min => AggregateExpression(
            Min(partials(ae.canonicalized).toAttribute), Complete, isDistinct = false)
          case _: Max => AggregateExpression(
            Max(partials(ae.canonicalized).toAttribute), Complete, isDistinct = false)
          // AVG = sum-of-partial-sums / sum-of-partial-counts. Double
          // division: a 0 count pairs with a NULL sum -> NULL (and double
          // division never raises, ANSI included)
          case Average(c, _) =>
            val counted = AggregateExpression(
              Sum(avgCounts(ae.canonicalized).toAttribute), Complete, isDistinct = false)
            Divide(Cast(summed, ae.dataType), Cast(counted, ae.dataType))
          case _ => summed
        }
    }.asInstanceOf[NamedExpression])
    Some((newAggExprs, newJoin))
  }
}
