package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused vector-vs-constant kernels for the LSH/IVF index builders: the
  * dot product against a hyperplane and the negated squared L2 distance
  * to a centroid, each IEEE-identical to the zip_with/aggregate HOF fold
  * it replaces (left fold in index order — fenced in SimilaritySuite)
  * but inside whole-stage codegen with no intermediate arrays. These run
  * per corpus row × planes (or × centroids) at index build, i.e. the
  * write-path cost of every ANN/near-dup index.
  *
  * Null semantics match zip_with: any null element or a length mismatch
  * with the constant vector yields null.
  */
abstract class VecConstExpr extends UnaryExpression {
  def weights: Seq[Double]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.sql}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @transient protected lazy val w: Array[Double] = weights.toArray

  /** Static fold entry (object-side) the generated code calls. */
  protected def foldName: String

  protected def fold(a: ArrayData): java.lang.Double

  override def nullSafeEval(input: Any): Any = fold(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the plain double[] (never `this` — a self-reference makes
    // the codegen references array drag the expression instance through
    // task serialization)
    val wRef = ctx.addReferenceObj("weights", w, "double[]")
    nullSafeCodeGen(ctx, ev, a => s"""
      java.lang.Double ${ev.value}_r = graft.functions.VecOps.$foldName($a, $wRef);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)
  }
}

/** dot(v, weights): ((0.0 + v0*w0) + v1*w1) + … */
case class DotConstExpr(child: Expression, weights: Seq[Double]) extends VecConstExpr {
  override def prettyName: String = "dot_const"
  override protected def foldName: String = "dotFold"
  override protected def fold(a: ArrayData): java.lang.Double = VecOps.dotFold(a, w)
  override protected def withNewChildInternal(newChild: Expression): DotConstExpr =
    copy(child = newChild)
}

/** -Σ (v_i - c_i)² — the monotone nearest-centroid score IVF ranks by. */
case class NegSqDistExpr(child: Expression, weights: Seq[Double]) extends VecConstExpr {
  override def prettyName: String = "neg_sq_dist"
  override protected def foldName: String = "negSqFold"
  override protected def fold(a: ArrayData): java.lang.Double = VecOps.negSqFold(a, w)
  override protected def withNewChildInternal(newChild: Expression): NegSqDistExpr =
    copy(child = newChild)
}

object VecOps {
  def dotFold(a: ArrayData, w: Array[Double]): java.lang.Double = {
    val n = a.numElements()
    if (n != w.length) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      acc += a.getDouble(i) * w(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def negSqFold(a: ArrayData, w: Array[Double]): java.lang.Double = {
    val n = a.numElements()
    if (n != w.length) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val d = a.getDouble(i) - w(i)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc * -1.0)
  }

  def sqDistLd(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i).toDouble - b.getDouble(i)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** [[sqDistLd]] against a constant double[] centroid — the same
    * left-to-right fold, so values are IEEE-identical (fenced in
    * RelevanceClusteringSuite via the argmin equivalence).
    */
  def sqDistLw(a: ArrayData, w: Array[Double]): java.lang.Double = {
    val n = a.numElements()
    if (n != w.length) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val d = a.getLong(i).toDouble - w(i)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Nearest-centroid index with EXACTLY the struct-min semantics of
    * `min(struct(sqDist(q, c), cidx))`: centroids scanned in ascending
    * cidx (the caller sorts), strict `<` keeps the lowest cidx on ties,
    * and a null distance (null element / length mismatch) sorts SMALLEST
    * — Spark's interpreted struct ordering is nulls-first — so the first
    * null-distance centroid wins over any finite one.
    */
  def argminSqFold(a: ArrayData, cidxs: Array[Int], cents: Array[Array[Double]]): Int = {
    var bestIdx = cidxs(0)
    var best = sqDistLw(a, cents(0))
    var c = 1
    while (c < cents.length) {
      val d = sqDistLw(a, cents(c))
      if (best != null && (d == null || d.doubleValue() < best.doubleValue())) {
        best = d
        bestIdx = cidxs(c)
      }
      c += 1
    }
    bestIdx
  }

  def sqDistLongDouble(a: Column, b: Column): Column =
    GraftSqlBridge.column(SqDistLongDoubleExpr(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def argminSqDist(q: Column, cidxs: Seq[Int], cents: Seq[Seq[Double]]): Column =
    GraftSqlBridge.column(ArgminSqDistExpr(
      GraftSqlBridge.expression(q), cidxs, cents))

  /** Grouped argmin: nearest inner-centroid index within the row's coarse
    * cell, probing a broadcast per-super centroid table. `q` is wrapped in
    * `coalesce(q, array())` by the caller so a null vector degrades to the
    * all-null-distance struct-min (lowest iidx of the cell), exactly like
    * the joined formulation — see [[GroupedCentroids]].
    */
  def argminSqDistGrouped(superCol: Column, q: Column,
                          groups: Broadcast[GroupedCentroids]): Column = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    GraftSqlBridge.column(ArgminSqDistGroupedExpr(
      GraftSqlBridge.expression(superCol),
      GraftSqlBridge.expression(coalesce(q,
        lit(Array.empty[Long]).cast("array<bigint>"))),
      groups))
  }

  def dotConst(v: Column, weights: Seq[Double]): Column =
    GraftSqlBridge.column(DotConstExpr(
      GraftSqlBridge.expression(v.cast("array<double>")), weights))

  def negSqDist(v: Column, weights: Seq[Double]): Column =
    GraftSqlBridge.column(NegSqDistExpr(
      GraftSqlBridge.expression(v.cast("array<double>")), weights))
}

/** Squared L2 distance between a quantized long vector and a double
  * centroid: ((0.0 + (a0-b0)²) + (a1-b1)²) + … with the long→double cast
  * per element — IEEE-identical to the zip_with/aggregate fold in
  * `Clustering.sqDist` (fenced in SimilaritySuite). The k-means
  * assignment hot loop (rows × centroids per Lloyd round).
  */
case class SqDistLongDoubleExpr(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sq_dist_lq requires array<bigint>, array<double>; got ${l.sql}, ${r.sql}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sq_dist_lq"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.sqDistLd(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.VecOps.sqDistLd($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SqDistLongDoubleExpr =
    copy(left = newLeft, right = newRight)
}

/** Fused k-means assignment: nearest-centroid index over a CONSTANT
  * centroid table (k × dim doubles, bounded by the same broadcast budget
  * the joined formulation had) — one whole-stage-codegen projection per
  * row instead of crossJoin × k + struct-min aggregation (which falls to
  * SortAggregate and drags the quantized vector through an exchange and
  * two sorts). Distance fold and tie/null semantics are IEEE-identical to
  * `min(struct(sq_dist_lq(q, cvec), cidx))` (VecOps.argminSqFold scaladoc;
  * fenced in RelevanceClusteringSuite). Null input → null (the caller
  * coalesces to the lowest cidx, matching the joined formulation's
  * all-null-distance struct-min).
  */
case class ArgminSqDistExpr(child: Expression, cidxs: Seq[Int], cents: Seq[Seq[Double]])
  extends UnaryExpression {
  require(cidxs.nonEmpty && cidxs.length == cents.length,
    "argmin_sq_dist requires a non-empty centroid table")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"argmin_sq_dist requires array<bigint>, got ${t.sql}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "argmin_sq_dist"

  @transient private lazy val idxArr: Array[Int] = cidxs.toArray
  @transient private lazy val centArr: Array[Array[Double]] = cents.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    VecOps.argminSqFold(input.asInstanceOf[ArrayData], idxArr, centArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val iRef = ctx.addReferenceObj("cidxs", idxArr, "int[]")
    val cRef = ctx.addReferenceObj("cents", centArr, "double[][]")
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.VecOps.argminSqFold($a, $iRef, $cRef);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): ArgminSqDistExpr =
    copy(child = newChild)
}

/** Per-coarse-cell centroid tables for [[ArgminSqDistGroupedExpr]]:
  * `iidxs(super)` / `cents(super)` hold the cell's inner-centroid indices
  * (ascending — [[VecOps.argminSqFold]]'s tie order) and vectors, or null
  * for a cell with no centroids. Primitive arrays throughout so the
  * broadcast serializes compactly and probes are allocation-free.
  */
final class GroupedCentroids(val iidxs: Array[Array[Int]],
                             val cents: Array[Array[Array[Double]]])
  extends Serializable

object GroupedCentroids {
  /** Build from driver-collected (super, iidx, cvec) triples. */
  def apply(rows: Array[(Int, Int, Array[Double])]): GroupedCentroids = {
    val n = if (rows.isEmpty) 0 else rows.map(_._1).max + 1
    val iidxs = new Array[Array[Int]](n)
    val cents = new Array[Array[Array[Double]]](n)
    rows.groupBy(_._1).foreach { case (sup, rs) =>
      val sorted = rs.sortBy(_._2)
      iidxs(sup) = sorted.map(_._2)
      cents(sup) = sorted.map(_._3)
    }
    new GroupedCentroids(iidxs, cents)
  }
}

/** Fused two-level k-means inner assignment: nearest inner-centroid index
  * WITHIN the row's coarse cell — one whole-stage-codegen projection
  * probing a broadcast super→centroids table, replacing the
  * shuffle-hash join × struct-min SortAggregate the joined formulation
  * pays per inner Lloyd round. Semantics are the joined path's exactly
  * (fenced in RelevanceClusteringSuite):
  *   - a super with no centroid rows yields NULL (the caller filters —
  *     the inner join dropped those rows);
  *   - distance fold and tie order are [[VecOps.argminSqFold]]'s, i.e.
  *     `min(struct(sq_dist_lq(q, cvec), iidx))` with nulls-first structs;
  *   - a null q arrives as an empty array (caller-side coalesce), whose
  *     length mismatch makes every distance null → lowest iidx, matching
  *     the joined path's all-null-distance struct-min.
  * The centroid table rides a [[Broadcast]] handle (the 1000-executor
  * shape), never the serialized plan.
  */
case class ArgminSqDistGroupedExpr(left: Expression, right: Expression,
                                   groups: Broadcast[GroupedCentroids])
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (IntegerType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"argmin_sq_dist_grouped requires int, array<bigint>; got ${l.sql}, ${r.sql}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "argmin_sq_dist_grouped"

  def compute(sup: Int, q: ArrayData): java.lang.Integer = {
    val g = groups.value
    if (sup < 0 || sup >= g.iidxs.length) return null
    val idxs = g.iidxs(sup)
    if (idxs == null) return null
    Integer.valueOf(VecOps.argminSqFold(q, idxs, g.cents(sup)))
  }

  override def nullSafeEval(s: Any, q: Any): Any =
    compute(s.asInstanceOf[Int], q.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("argminGrouped", this,
      classOf[ArgminSqDistGroupedExpr].getName)
    nullSafeCodeGen(ctx, ev, (s, q) => s"""
      java.lang.Integer ${ev.value}_r = $ref.compute($s, $q);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.intValue(); }
    """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArgminSqDistGroupedExpr =
    copy(left = newLeft, right = newRight)
}
