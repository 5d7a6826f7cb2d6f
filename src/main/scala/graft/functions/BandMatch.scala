package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** First matching band index between two per-document kept-bucket vectors —
  * the dedup-free LSH candidate emission test (r14, d_minhash).
  *
  * Each document carries a fixed-length array with one slot per band:
  * slot j holds the doc's band-j bucket key, or NULL when that bucket was
  * dropped by the per-bucket cap (or the doc has no entry). Two documents
  * are LSH candidates iff some slot matches (both non-null, equal); a pair
  * meeting in several bands is emitted once by keeping only the instance
  * whose band equals the FIRST matching slot — replacing the
  * dropDuplicates exchange over every pair instance (the measured wall at
  * 100×: 176M instances hashed down to 27M pairs) with a per-instance
  * 8-slot compare. Returns the first matching index, or null when no slot
  * matches (never the case on a join-produced instance, handled anyway).
  */
case class FirstMatchBandExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"first_match_band requires array<bigint>, array<bigint>; got ${l.sql}, ${r.sql}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "first_match_band"

  override def nullSafeEval(a: Any, b: Any): Any =
    FirstMatchBandExpr.firstMatch(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Integer ${ev.value}_r =
        graft.functions.FirstMatchBandExpr.firstMatch($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.intValue(); }
    """)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FirstMatchBandExpr =
    copy(left = newLeft, right = newRight)
}

object FirstMatchBandExpr {
  def firstMatch(a: ArrayData, b: ArrayData): java.lang.Integer = {
    val n = math.min(a.numElements(), b.numElements())
    var j = 0
    while (j < n) {
      if (!a.isNullAt(j) && !b.isNullAt(j) && a.getLong(j) == b.getLong(j))
        return Integer.valueOf(j)
      j += 1
    }
    null
  }

  def firstMatchBand(a: Column, b: Column): Column =
    GraftSqlBridge.column(FirstMatchBandExpr(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
