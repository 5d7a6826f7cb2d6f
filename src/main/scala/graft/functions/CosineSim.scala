package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** One-pass fused cosine similarity between two `array<double>` columns.
  *
  * Replaces the three interpreted higher-order-function folds the naive
  * formulation needs (`zip_with` product + three `aggregate`s + two
  * `transform`s — HOFs are CodegenFallback in Spark, so every element
  * bounces through an interpreted lambda and two intermediate arrays per
  * row-pair) with ONE branch-free loop over both arrays, inside
  * whole-stage codegen. This is the hot inner loop of every embedding
  * operator (brute-force kNN scores |corpus|×|queries| pairs; near-dup
  * and SemDeDup score candidate pairs), so per-pair cost is the whole
  * game at 100 TB.
  *
  * Semantics are IEEE-identical to the HOF formulation it replaces
  * (fenced in SimilaritySuite):
  *   dot = ((0.0 + a0*b0) + a1*b1) + …   (left fold, index order)
  *   result = dot / (sqrt(Σa_i²) * sqrt(Σb_i²))
  * Zero-norm vectors (denominator exactly 0) yield NULL — Spark's legacy
  * Divide semantics; under ANSI mode the HOF formulation would THROW on
  * them, which is never what a 100 TB scoring pass wants on one
  * degenerate vector. Null propagation matches `zip_with`: any null
  * element, or a length mismatch (zip_with pads the shorter side with
  * nulls), makes the result null.
  */
case class CosineSimExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires two array<double> arguments, got ${l.sql}, ${r.sql}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.CosineSimExpr.compute($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpr {

  /** Column wrapper; inputs are cast to array<double> so float-typed
    * embedding columns get the same double-precision math the oracle runs.
    */
  def cosineSim(a: Column, b: Column): Column =
    GraftSqlBridge.column(CosineSimExpr(
      GraftSqlBridge.expression(a.cast("array<double>")),
      GraftSqlBridge.expression(b.cast("array<double>"))))

  /** Called once per row-pair from generated code. Returns null on length
    * mismatch or any null element (zip_with null semantics).
    */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null
    else java.lang.Double.valueOf(dot / denom)
  }
}
