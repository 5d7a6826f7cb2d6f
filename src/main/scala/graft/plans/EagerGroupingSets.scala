package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType}

/** Eager aggregation below grouping-set expansion.
  *
  * Spark plans `GROUP BY CUBE/ROLLUP/GROUPING SETS` as
  * `Aggregate(dims+gid, Expand(N projections, base))` — every base row is
  * replicated N times (4x for a 2-column CUBE) BEFORE the hash aggregate
  * and its shuffle. When every aggregate is decomposable, the base can be
  * pre-aggregated by the grouping source columns first:
  *
  *   Aggregate(dims+gid, merge, Expand(N, Aggregate(srcDims, partials, base)))
  *
  * so the Expand replicates |distinct(srcDims)| pre-aggregated rows
  * instead of |base| raw rows — at 100 TB the difference between
  * shuffling N x 60M rows and N x a few thousand. (Measured at 100x:
  * q_cube 1.66 s -> sub-0.5 s; DuckDB streams grouping sets natively,
  * this is the Spark-shaped equivalent.)
  *
  * Safety gates:
  *  - every projection entry at a position referenced by an aggregate
  *    must be the SAME expression in ALL projections (true for grouping
  *    analytics, where only the masked grouping copies vary; false for
  *    RewriteDistinctAggregates' Expand, which nulls inputs per group —
  *    so that shape is naturally excluded);
  *  - grouping positions contain only attributes or literals (the
  *    analyzer projects complex grouping expressions below the Expand);
  *  - aggregates are non-DISTINCT, non-FILTER SUM/COUNT/MIN/MAX (plus
  *    AVG over float/double, decomposed to SUM+COUNT), non-decimal SUM
  *    (double-summing would widen precision differently);
  *  - base side larger than `graft.eagerAgg.minBytes` (same knob as
  *    EagerAggregation — below it the extra aggregate costs more than
  *    the replication it avoids).
  */
object EagerGroupingSets extends Rule[LogicalPlan] {

  private def minBytes: Long =
    SQLConf.get.getConfString(EagerAggregation.confKey,
      (32L * 1024 * 1024).toString).toLong

  def apply(plan: LogicalPlan): LogicalPlan = {
    if (plan.isStreaming) return plan
    plan.transform {
      case agg @ Aggregate(groupings, aggExprs, ExpandMaybeProject(expand), _)
          if groupings.nonEmpty && expand.projections.size >= 2 =>
        rewrite(agg, groupings, aggExprs, expand).getOrElse(agg)
    }
  }

  private object ExpandMaybeProject {
    def unapply(plan: LogicalPlan): Option[Expand] = plan match {
      case e: Expand => Some(e)
      case Project(projList, e: Expand)
          if projList.forall(_.isInstanceOf[AttributeReference]) => Some(e)
      case _ => None
    }
  }

  private def rewrite(agg: Aggregate, groupings: Seq[Expression],
                      aggExprs: Seq[NamedExpression], expand: Expand): Option[Aggregate] = {
    val child = expand.child
    if (child.isInstanceOf[Aggregate]) return None // already pushed
    val output = expand.output
    val posOf: Map[Attribute, Int] = output.zipWithIndex.map { case (a, i) => a -> i }.toMap

    val aggCalls = aggExprs.flatMap(_.collect { case ae: AggregateExpression => ae })
    if (aggCalls.isEmpty) return None

    // positions referenced inside aggregate calls must carry the SAME
    // child-side expression in every projection
    val aggPositions: Set[Int] =
      aggCalls.flatMap(_.references).flatMap(posOf.get).toSet
    val stable: Map[Int, Expression] = aggPositions.iterator.map { i =>
      val exprs = expand.projections.map(_(i))
      if (exprs.distinct.size != 1) return None
      val e = exprs.head
      if (!e.deterministic || !e.references.subsetOf(child.outputSet)) return None
      i -> e
    }.toMap

    // grouping positions: attributes (collected as pre-agg keys) or
    // literals (null masks / grouping id) only
    val groupingPositions: Set[Int] =
      groupings.flatMap(_.references).flatMap(posOf.get).toSet
    val keys = mutable.LinkedHashSet[Attribute]()
    for (p <- expand.projections; i <- groupingPositions) p(i) match {
      case a: AttributeReference =>
        if (!child.outputSet.contains(a)) return None
        keys += a
      case _: Literal => ()
      case _ => return None
    }

    def pushable(ae: AggregateExpression): Boolean =
      ae.filter.isEmpty && !ae.isDistinct &&
        !ae.dataType.isInstanceOf[DecimalType] &&
        ae.references.forall(a => posOf.get(a).exists(stable.contains)) &&
        (ae.aggregateFunction match {
          case _: Sum | _: Count | _: Min | _: Max => true
          case Average(c, _) => c.dataType == DoubleType || c.dataType == FloatType
          case _ => false
        })
    if (!aggCalls.forall(pushable)) return None
    if (child.stats.sizeInBytes < BigInt(minBytes)) return None

    // rewrite an aggregate-input expression from Expand-output attrs to
    // the child-side expressions the projections pass through
    def toChild(e: Expression): Expression = e.transform {
      case a: Attribute if posOf.contains(a) => stable(posOf(a))
    }

    val partials = mutable.LinkedHashMap[Expression, Alias]()
    val avgCounts = mutable.LinkedHashMap[Expression, Alias]()
    for (ae <- aggCalls if !partials.contains(ae.canonicalized))
      ae.aggregateFunction match {
        case Average(c, _) =>
          partials(ae.canonicalized) =
            Alias(AggregateExpression(Sum(toChild(c)), Complete, isDistinct = false), "__graft_gpartial")()
          avgCounts(ae.canonicalized) =
            Alias(AggregateExpression(Count(Seq(toChild(c))), Complete, isDistinct = false), "__graft_gpartial")()
        case f =>
          partials(ae.canonicalized) =
            Alias(AggregateExpression(f.mapChildren(toChild).asInstanceOf[AggregateFunction],
              Complete, isDistinct = false), "__graft_gpartial")()
      }

    val preAgg = Aggregate(keys.toSeq, keys.toSeq ++ partials.values ++ avgCounts.values, child)
    val partialAttrs = (partials.values ++ avgCounts.values).map(_.toAttribute).toSeq
    // new Expand: partial columns (same in every projection) followed by
    // the original grouping-position columns (attrs kept by the pre-agg,
    // null masks, grouping id) — original output attrs reused so the
    // outer groupings stay resolved
    val keptPositions = output.indices.filter(groupingPositions.contains)
    val newOutput = partialAttrs ++ keptPositions.map(output)
    val newProjections = expand.projections.map { p =>
      partialAttrs ++ keptPositions.map(p)
    }
    val newExpand = Expand(newProjections, newOutput, preAgg)

    val newAggExprs = aggExprs.map(_.transform {
      case ae: AggregateExpression if partials.contains(ae.canonicalized) =>
        val part = partials(ae.canonicalized).toAttribute
        def sumOf(a: Attribute) =
          AggregateExpression(Sum(a), Complete, isDistinct = false)
        ae.aggregateFunction match {
          case _: Count => Coalesce(Seq(sumOf(part), Literal(0L)))
          case _: Min => AggregateExpression(Min(part), Complete, isDistinct = false)
          case _: Max => AggregateExpression(Max(part), Complete, isDistinct = false)
          case Average(_, _) =>
            val cnt = avgCounts(ae.canonicalized).toAttribute
            Divide(Cast(sumOf(part), ae.dataType), Cast(sumOf(cnt), ae.dataType))
          case _ => sumOf(part)
        }
    }.asInstanceOf[NamedExpression])

    Some(agg.copy(aggregateExpressions = newAggExprs, child = newExpand))
  }
}
